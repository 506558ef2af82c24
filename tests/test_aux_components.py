"""Auxiliary components: kNN probe, legacy bags, mosaic, annotations, logging."""
import os

import numpy as np
import pytest

from hipt_abmil_atec23_tpu.engine.knn_probe import (
    knn_classify, aggregate_slide_features, knn_cv_probe)
from hipt_abmil_atec23_tpu.slideio.legacy import (
    is_white_patch, is_black_patch, save_hdf5, create_patch_bag_hdf5,
    load_patch_bag_hdf5, MosaicCanvas, load_annotations_xml,
    load_annotations_txt)
from hipt_abmil_atec23_tpu.utils.logging import MetricsLogger, StageTimer


def test_knn_classify_separable(rng):
    train_x = np.concatenate([rng.normal(0, 1, (50, 16)),
                              rng.normal(4, 1, (50, 16))]).astype(np.float32)
    train_y = np.array([0] * 50 + [1] * 50)
    test_x = np.concatenate([rng.normal(0, 1, (10, 16)),
                             rng.normal(4, 1, (10, 16))]).astype(np.float32)
    probs = knn_classify(train_x, train_y, test_x, k=10, n_classes=2)
    preds = probs.argmax(1)
    assert (preds == np.array([0] * 10 + [1] * 10)).mean() >= 0.9


def test_knn_cv_probe(tmp_path, rng):
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.data.splits import generate_kfold_splits
    manifest, store = make_synthetic_bags(str(tmp_path), n_slides=30,
                                          feat_dim=64, signal=3.0,
                                          signal_fraction=0.8, seed=0)
    splits = generate_kfold_splits(manifest.labels, 3, seed=0)
    out = knn_cv_probe(store, manifest, splits, k=5)
    assert out["auc_mean"] > 0.8


def test_hipt_lgp_aggregator_torch_parity(rng):
    """hipt_lgp_aggregate matches a torch oracle built exactly like the
    reference's HIPT_LGP_FC global branch (HIPT_knn.py:13-27): phi ->
    2-layer post-norm TransformerEncoder (d=192, nhead=3, ffn=192) ->
    gated attention pool -> rho, in eval mode."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    from hipt_abmil_atec23_tpu.models.hipt_mil import (
        hipt_lgp_aggregate, hipt_lgp_params_from_torch)

    class GatedPool(tnn.Module):
        def __init__(self, L=192, D=192):
            super().__init__()
            self.attention_a = tnn.Sequential(tnn.Linear(L, D), tnn.Tanh())
            self.attention_b = tnn.Sequential(tnn.Linear(L, D), tnn.Sigmoid())
            self.attention_c = tnn.Linear(D, 1)

        def forward(self, x):
            return self.attention_c(self.attention_a(x)
                                    * self.attention_b(x)), x

    class GlobalBranch(tnn.Module):
        def __init__(self):
            super().__init__()
            self.global_phi = tnn.Sequential(tnn.Linear(192, 192), tnn.ReLU(),
                                             tnn.Dropout(0.25))
            self.global_transformer = tnn.TransformerEncoder(
                tnn.TransformerEncoderLayer(
                    d_model=192, nhead=3, dim_feedforward=192, dropout=0.25,
                    activation="relu"), num_layers=2)
            self.global_attn_pool = GatedPool()
            self.global_rho = tnn.Sequential(tnn.Linear(192, 192), tnn.ReLU(),
                                             tnn.Dropout(0.25))

        def forward(self, feats):  # [N, 192]
            h = self.global_phi(feats)
            h = self.global_transformer(h.unsqueeze(1)).squeeze(1)
            A, h = self.global_attn_pool(h)
            A = F.softmax(A.transpose(1, 0), dim=1)
            return self.global_rho(torch.mm(A, h))[0]

    torch.manual_seed(0)
    oracle = GlobalBranch().eval()
    feats = rng.normal(size=(37, 192)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(feats)).numpy()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = hipt_lgp_params_from_torch(sd)
    got = np.asarray(hipt_lgp_aggregate(params, feats))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_knn_cv_probe_hipt_lgp(tmp_path, rng):
    """The hipt_lgp aggregation path runs end to end (random-init params)."""
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.data.splits import generate_kfold_splits
    manifest, store = make_synthetic_bags(str(tmp_path), n_slides=12,
                                          feat_dim=192, signal=3.0,
                                          signal_fraction=0.8, seed=0,
                                          bag_range=(64, 65))
    splits = generate_kfold_splits(manifest.labels, 3, seed=0)
    out = knn_cv_probe(store, manifest, splits, k=3, method="hipt_lgp")
    assert 0.0 <= out["auc_mean"] <= 1.0


def test_white_black_filters():
    white = np.full((64, 64, 3), 250, np.uint8)
    black = np.full((64, 64, 3), 5, np.uint8)
    pink = np.zeros((64, 64, 3), np.uint8)
    pink[:] = (200, 120, 180)
    assert is_white_patch(white) and not is_white_patch(pink)
    assert is_black_patch(black) and not is_black_patch(pink)


def test_save_hdf5_append(tmp_path):
    import h5py
    path = str(tmp_path / "bag.h5")
    save_hdf5(path, {"x": np.ones((3, 4))}, {"x": {"meta": 1}})
    save_hdf5(path, {"x": np.zeros((2, 4))})
    with h5py.File(path) as f:
        assert f["x"].shape == (5, 4)
        assert f["x"].attrs["meta"] == 1


def test_legacy_patch_bag(tmp_path, rng):
    from hipt_abmil_atec23_tpu.slideio.reader import ImageSlide
    from hipt_abmil_atec23_tpu.slideio.synthetic import make_tissue_image
    img = make_tissue_image(1024, 1024, seed=1)
    img[:256, :256] = 255  # one all-white patch region
    slide = ImageSlide(img)
    coords = np.array([[0, 0], [256, 256], [512, 512]], np.int64)
    path = str(tmp_path / "imgbag.h5")
    kept = create_patch_bag_hdf5(slide, coords, path, patch_size=256)
    imgs, kept_coords = load_patch_bag_hdf5(path)
    assert kept == len(kept_coords) <= 2  # white patch dropped
    assert imgs.shape[1:] == (256, 256, 3)


def test_mosaic_canvas():
    m = MosaicCanvas(patch_size=64, n=4, downscale=2, n_per_row=2)
    for v in (50, 100, 150, 200):
        m.paste(np.full((64, 64, 3), v, np.uint8))
    assert m.canvas.shape == (64, 64, 3)
    assert m.canvas[0, 0, 0] == 50 and m.canvas[40, 40, 0] == 200


def test_annotation_loaders(tmp_path):
    xml = tmp_path / "a.xml"
    xml.write_text("""<root><Annotations>
      <Annotation><Coordinates>
        <Coordinate X="0" Y="0"/><Coordinate X="100" Y="0"/>
        <Coordinate X="100" Y="100"/><Coordinate X="0" Y="100"/>
      </Coordinates></Annotation>
      <Annotation><Coordinates>
        <Coordinate X="0" Y="0"/><Coordinate X="10" Y="0"/>
        <Coordinate X="10" Y="10"/><Coordinate X="0" Y="10"/>
      </Coordinates></Annotation>
    </Annotations></root>""")
    cts = load_annotations_xml(str(xml))
    assert len(cts) == 2 and cts[0].shape == (4, 1, 2)
    # sorted largest first
    import cv2
    assert cv2.contourArea(cts[0]) > cv2.contourArea(cts[1])

    txt = tmp_path / "a.txt"
    txt.write_text("{'tumor': [[(0,0),(50,0),(50,50),(0,50)]]}")
    cts2 = load_annotations_txt(str(txt))
    assert len(cts2) == 1


def test_metrics_logger_and_timer(tmp_path):
    log = MetricsLogger(str(tmp_path / "logs"))
    log.scalar("train/loss", 0.5, 0)
    log.scalars({"auc": 0.7, "acc": 0.6}, 1, prefix="val/")
    log.close()
    import json
    lines = [json.loads(l) for l in
             open(tmp_path / "logs" / "metrics.jsonl")]
    assert len(lines) == 3 and lines[0]["tag"] == "train/loss"

    t = StageTimer()
    with t.time("encode", items=4):
        pass
    s = t.summary()
    assert s["encode"]["count"] == 4 and s["encode"]["per_hour"] > 0


def test_experiment_config_json_roundtrip(tmp_path):
    """ExperimentConfig.save/load rebuilds NESTED dataclasses (regression:
    PEP-563 string annotations left nested configs as raw dicts)."""
    import json
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, ModelConfig, TrainConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(model_size="hipt_big", drop_out=0.3),
        train=TrainConfig(lr=5e-4, k=7, epoch_chunk=4))
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    back = ExperimentConfig.load(path)
    assert isinstance(back.model, ModelConfig)
    assert back.model.model_size == "hipt_big"
    assert back.train.lr == 5e-4 and back.train.epoch_chunk == 4
    assert isinstance(back.task.ignore, tuple)
    # the shipped winning-config template loads too
    d = json.load(open("configs/train_winning_hipt_abmil.json"))
    d.pop("_comment")
    win = ExperimentConfig.from_dict(d)
    assert win.model.model_size == "hipt_smaller"
    assert win.train.reg == 0.5 and win.model.no_inst_cluster


def test_yaml_configs(tmp_path):
    """YAML configs load like JSON (the reference's heatmap stage is
    YAML-configured, create_heatmaps.py:82-112)."""
    from hipt_abmil_atec23_tpu.explain.driver import HeatmapJobConfig
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, ModelConfig)

    job = HeatmapJobConfig.load("configs/heatmap_template.yaml")
    ref = HeatmapJobConfig.load("configs/heatmap_template.json")
    assert job == ref  # the two shipped templates are the same job

    path = str(tmp_path / "cfg.yaml")
    with open(path, "w") as f:
        f.write("model:\n  model_size: hipt_big\ntrain:\n  lr: 0.0005\n")
    cfg = ExperimentConfig.load(path)
    assert isinstance(cfg.model, ModelConfig)
    assert cfg.model.model_size == "hipt_big" and cfg.train.lr == 5e-4
