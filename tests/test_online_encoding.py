"""Online feature extraction during training (--extract_features path)."""
import os

import numpy as np
import pytest

from hipt_abmil_atec23_tpu.data.online import OnlineEncodingBagDataset
from hipt_abmil_atec23_tpu.engine.encode import build_encoder
from hipt_abmil_atec23_tpu.engine.train import train_fold
from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.patching import (
    enumerate_coords, save_coords_h5, coords_attrs)
from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide
from hipt_abmil_atec23_tpu.utils.config import (
    BagConfig, EncoderConfig, ExperimentConfig, ModelConfig, SegConfig,
    TaskConfig, TileConfig, TrainConfig)


@pytest.fixture(scope="module")
def online_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("online")
    coords_dir = d / "patches"
    coords_dir.mkdir()
    slide_paths = {}
    labels = []
    ids = []
    tile_cfg = TileConfig(patch_size=256, step_size=256,
                          seg=SegConfig(use_otsu=True, a_t=1, close=4))
    for i in range(8):
        sid = f"on{i}"
        path = str(d / f"{sid}.tif")
        write_synthetic_slide(path, 1536, 1024, n_levels=3,
                              compression=native.COMPRESSION_DEFLATE, seed=i)
        slide = TiffSlide(path)
        seg = segment_tissue(slide, tile_cfg.seg)
        coords = enumerate_coords(slide, seg, tile_cfg)
        save_coords_h5(str(coords_dir / f"{sid}.h5"), coords,
                       coords_attrs(slide, tile_cfg, sid, str(coords_dir)))
        slide.close()
        slide_paths[sid] = path
        ids.append(sid)
        labels.append(i % 2)
    return ids, np.asarray(labels, np.int32), slide_paths, str(coords_dir)


def test_online_bag_encoding(online_setup, rng):
    ids, labels, slide_paths, coords_dir = online_setup
    encoder = build_encoder(EncoderConfig(model_type="resnet18",
                                          batch_size=8, dtype="float32"))
    cfg = BagConfig(max_patches_per_slide=12)
    ds = OnlineEncodingBagDataset(ids, labels, encoder, slide_paths,
                                  coords_dir, cfg)
    n0 = len(ds._coords(ids[0]))
    bag = ds.get_bag(0, rng)
    assert bag.shape == (min(12, n0), 512) and np.isfinite(bag).all()
    assert ds.pad_size() <= 16 and ds.pad_size() % 8 == 0
    ds.close()


def test_online_training_fold(online_setup):
    """Train the MIL head directly from pixels (frozen encoder in the loop,
    reference: --extract_features)."""
    ids, labels, slide_paths, coords_dir = online_setup
    encoder = build_encoder(EncoderConfig(model_type="resnet18",
                                          batch_size=8, dtype="float32"))
    bag_cfg = BagConfig(max_patches_per_slide=8, batch_size=1)
    mk = lambda sl: OnlineEncodingBagDataset(
        [ids[i] for i in sl], labels[list(sl)], encoder, slide_paths,
        coords_dir, bag_cfg)
    cfg = ExperimentConfig(
        exp_code="online", results_dir="/tmp/online_results",
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=bag_cfg,
        model=ModelConfig(model_type="clam_sb", model_size="tinier_resnet18",
                          no_inst_cluster=True),
        train=TrainConfig(lr=1e-3, max_epochs=2, min_epochs=1,
                          early_stopping=False, k=3, seed=0))
    res = train_fold(cfg, 0, mk(range(0, 4)), mk(range(4, 6)),
                     mk(range(6, 8)), np.array([4, 4]),
                     feat_dim=encoder.feat_dim, verbose=False)
    assert np.isfinite(res.test_auc) or len(set(labels[6:8])) < 2
    assert len(res.history) == 2


def test_cli_train_extract_features(online_setup, tmp_path):
    import pandas as pd
    from hipt_abmil_atec23_tpu.cli import main as cli
    ids, labels, slide_paths, coords_dir = online_setup
    data_dir = os.path.dirname(coords_dir)
    csv = str(tmp_path / "labels.csv")
    pd.DataFrame({"case_id": ids, "slide_id": ids,
                  "label": ["invalid" if l == 0 else "effective"
                            for l in labels]}).to_csv(csv, index=False)
    results = str(tmp_path / "results")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", str(tmp_path / "unused"), "--results_dir", results,
         "--extract_features", "--data_h5_dir", data_dir,
         "--data_slide_dir", data_dir, "--model_architecture", "resnet18",
         "--model_size", "tinier_resnet18", "--k", "3", "--max_epochs", "2",
         "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "8"])
    summary = pd.read_csv(os.path.join(results, "summary.csv"))
    assert len(summary) == 3
