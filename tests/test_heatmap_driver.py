"""Config-driven batch heatmap job + CLI sampling/tuning wiring."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide


def test_heatmap_job_config_roundtrip(tmp_path):
    from hipt_abmil_atec23_tpu.explain.driver import HeatmapJobConfig
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps({
        "slide_dir": "/x", "save_dir": "/y", "ckpt_path": "/z.msgpack",
        "patch_size": 256, "fine_pass": True,
        "seg": {"use_otsu": True, "a_t": 1},
        "model": {"model_type": "clam_sb", "model_size": "tinier_resnet18"},
        "encoder": {"model_type": "resnet18", "batch_size": 4,
                    "dtype": "float32"},
    }))
    cfg = HeatmapJobConfig.load(str(cfg_path))
    assert cfg.patch_size == 256 and cfg.seg.use_otsu
    assert cfg.encoder.model_type == "resnet18"


def test_run_heatmap_job_end_to_end(tmp_path):
    """Full batch heatmap job: seg -> coords -> encode -> attention ->
    heatmap + fine pass + ROIs, on two synthetic slides."""
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.checkpoint import save_params
    from hipt_abmil_atec23_tpu.explain.driver import (
        HeatmapJobConfig, run_heatmap_job)
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.utils.config import (
        EncoderConfig, ModelConfig, SegConfig)

    slides = tmp_path / "slides"
    slides.mkdir()
    for i in range(2):
        write_synthetic_slide(str(slides / f"hm{i}.tif"), 1536, 1536,
                              n_levels=3,
                              compression=native.COMPRESSION_DEFLATE, seed=i)

    model = build_mil_model("clam_sb", size_arg="tinier_resnet18", n_classes=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((8, 512), jnp.float32), None)
    ckpt = str(tmp_path / "m.msgpack")
    save_params(ckpt, params)

    cfg = HeatmapJobConfig(
        slide_dir=str(slides), save_dir=str(tmp_path / "out"),
        ckpt_path=ckpt, patch_size=256, step_size=256,
        seg=SegConfig(use_otsu=True, a_t=1, close=4),
        model=ModelConfig(model_type="clam_sb", model_size="tinier_resnet18"),
        encoder=EncoderConfig(model_type="resnet18", batch_size=8,
                              dtype="float32"),
        fine_pass=True, fine_step_fraction=0.5, sample_topk=3)
    results = run_heatmap_job(cfg, verbose=False)
    assert len(results) == 2
    out0 = tmp_path / "out" / "hm0"
    files = os.listdir(out0)
    assert "hm0_heatmap.jpg" in files
    assert "hm0_heatmap_fine.jpg" in files
    assert "hm0_blockmap.h5" in files
    assert sum(1 for f in files if f.startswith("roi_")) == 3
    assert os.path.exists(tmp_path / "out" / "predictions.json")
    # rerun reuses cached segmentation pickle without error
    run_heatmap_job(cfg, verbose=False)


def test_cli_tuning_mode(tmp_path):
    from hipt_abmil_atec23_tpu.cli import main as cli
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    manifest, store = make_synthetic_bags(str(tmp_path / "bags"), n_slides=18,
                                          feat_dim=192, seed=0)
    csv = str(tmp_path / "bags" / "labels.csv")
    df = pd.read_csv(csv)
    df["label"] = df["label"].map({0: "invalid", 1: "effective"})
    df.to_csv(csv, index=False)
    results = str(tmp_path / "results")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", str(tmp_path / "bags"), "--results_dir", results,
         "--model_size", "hipt_smaller", "--k", "3", "--max_epochs", "3",
         "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "16", "--tuning",
         "--num_tuning_samples", "2", "--grace_period", "2"])
    out = pd.read_csv(os.path.join(results, "tuning_results.csv"))
    assert len(out) == 2 and "last10_val_loss" in out.columns


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_heatmap_cli_with_reference_torch_checkpoint(tmp_path):
    """The shipped reference demo checkpoint (torch .pt, CLAM_SB 'small'
    1024-d) drives the heatmap CLI directly on a synthetic slide."""
    demo = "/root/reference/heatmaps/demo/ckpts/s_0_checkpoint.pt"
    if not os.path.exists(demo):
        pytest.skip("demo checkpoint not shipped")
    import numpy as np
    from hipt_abmil_atec23_tpu.cli import main as cli
    from hipt_abmil_atec23_tpu.data.bags import FeatureBagStore
    from hipt_abmil_atec23_tpu.slideio.patching import (
        enumerate_coords, save_coords_h5, coords_attrs)
    from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
    from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue
    from hipt_abmil_atec23_tpu.utils.config import SegConfig, TileConfig

    slide_path = str(tmp_path / "demo.tif")
    write_synthetic_slide(slide_path, 1536, 1536, n_levels=3,
                          compression=native.COMPRESSION_DEFLATE, seed=0)
    slide = TiffSlide(slide_path)
    seg = segment_tissue(slide, SegConfig(use_otsu=True, a_t=1, close=4))
    cfg = TileConfig(patch_size=256, step_size=256)
    coords = enumerate_coords(slide, seg, cfg)
    h5 = str(tmp_path / "demo_coords.h5")
    save_coords_h5(h5, coords, coords_attrs(slide, cfg, "demo", str(tmp_path)))
    # precomputed 1024-d features (the ckpt is a 1024-d 'small' CLAM)
    store = FeatureBagStore(str(tmp_path / "feats"))
    rng = np.random.default_rng(0)
    store.save("demo", rng.normal(size=(len(coords), 1024)).astype("float32"),
               coords=coords, formats=("pt",))
    slide.close()

    out = str(tmp_path / "hm")
    cli(["heatmap", "--slide", slide_path, "--coords_h5", h5,
         "--features", os.path.join(str(tmp_path / "feats"), "pt_files",
                                    "demo.pt"),
         "--ckpt", demo, "--model_size", "small", "--save_dir", out])
    assert any(f.endswith("_heatmap.jpg") for f in os.listdir(out))
