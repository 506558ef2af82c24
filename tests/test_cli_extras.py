"""Coverage for the remaining CLI paths: fold-parallel train, eval sampling,
knn probe, debug loader, log_data, sampling visualizations."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from hipt_abmil_atec23_tpu.cli import main as cli
from hipt_abmil_atec23_tpu.data.bags import FeatureBagStore
from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags


@pytest.fixture(scope="module")
def bag_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("clix")
    manifest, store = make_synthetic_bags(
        str(root / "feats"), n_slides=24, feat_dim=192, signal=1.5,
        signal_fraction=0.4, bag_range=(60, 160), seed=9, fmt="npy")
    # also write h5 bags WITH coords (eval --use_sampling needs them)
    rng = np.random.default_rng(0)
    for sid in manifest.slide_ids:
        feats = store.load_features(sid)
        coords = rng.integers(0, 30000, size=(len(feats), 2))
        store.save(sid, feats, coords=coords, formats=("h5",))
    csv = str(root / "labels.csv")
    df = pd.read_csv(os.path.join(root / "feats", "labels.csv"))
    df["label"] = df["label"].map({0: "invalid", 1: "effective"})
    df.to_csv(csv, index=False)
    return root, csv, str(root / "feats")


def test_cli_fold_parallel_train(bag_workspace):
    root, csv, feats = bag_workspace
    results = str(root / "results_fp")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results, "--fold_parallel",
         "--k", "4", "--max_epochs", "4", "--min_epochs", "1",
         "--no_early_stopping", "--max_patches_per_slide", "32",
         "--weighted_sample"])
    summary = pd.read_csv(os.path.join(results, "summary.csv"))
    assert len(summary) == 4 and np.isfinite(summary["test_auc"]).all()


def test_cli_train_then_eval_sampling(bag_workspace):
    root, csv, feats = bag_workspace
    results = str(root / "results_es")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results,
         "--k", "3", "--max_epochs", "3", "--min_epochs", "1",
         "--no_early_stopping", "--max_patches_per_slide", "32"])
    evals = str(root / "eval_sampling")
    cli(["eval", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--models_dir", results, "--save_dir", evals,
         "--k", "3", "--folds", "0", "--use_sampling",
         "--samples_per_iteration", "24", "--resampling_iterations", "2",
         "--sampling_neighbors", "8", "--final_sample_size", "32"])
    summary = pd.read_csv(os.path.join(evals, "summary.csv"))
    assert "mean_patches_used" in summary.columns
    fold0 = pd.read_csv(os.path.join(evals, "fold_0.csv"))
    assert {"slide_id", "Y", "Y_hat", "p_0", "p_1"} <= set(fold0.columns)


def test_cli_knn(bag_workspace, capsys):
    root, csv, feats = bag_workspace
    cli(["knn", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--k", "5", "--folds", "3"])
    out = json.loads(capsys.readouterr().out)
    assert 0 <= out["auc_mean"] <= 1


def test_cli_debug_loader(bag_workspace, capsys):
    root, csv, feats = bag_workspace
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", str(root / "dbg"),
         "--debug_loader", "--max_patches_per_slide", "16"])
    out = capsys.readouterr().out
    assert "bags OK" in out


def test_cli_train_log_data(bag_workspace):
    root, csv, feats = bag_workspace
    results = str(root / "results_log")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results, "--log_data",
         "--k", "3", "--k_end", "1", "--max_epochs", "2", "--min_epochs", "1",
         "--no_early_stopping", "--max_patches_per_slide", "16"])
    metrics = os.path.join(results, "0", "metrics.jsonl")
    assert os.path.exists(metrics)
    lines = [json.loads(l) for l in open(metrics)]
    assert any(r["tag"] == "val_auc" for r in lines)
    # partial fold range -> partial summary name, summary.csv untouched
    assert os.path.exists(os.path.join(results, "summary_partial_0_1.csv"))
    assert not os.path.exists(os.path.join(results, "summary.csv"))


def test_sampling_visualizations(tmp_path, rng):
    from hipt_abmil_atec23_tpu.explain.sampling_vis import (
        plot_sampling, plot_weight_map, sampling_gif)
    from hipt_abmil_atec23_tpu.slideio.reader import ImageSlide
    from hipt_abmil_atec23_tpu.slideio.synthetic import make_tissue_image
    slide = ImageSlide(make_tissue_image(1024, 768, seed=0))
    coords = rng.integers(0, 700, size=(40, 2))
    p1 = str(tmp_path / "s1.png")
    plot_sampling(slide, coords, p1)
    p2 = str(tmp_path / "w.png")
    plot_weight_map(coords, rng.uniform(0, 1, 40), p2)
    gif = str(tmp_path / "iters.gif")
    sampling_gif([p1, p2], gif)
    for f in (p1, p2, gif):
        assert os.path.getsize(f) > 0


def test_cli_eval_tune_sampling(bag_workspace):
    root, csv, feats = bag_workspace
    results = str(root / "results_es")  # trained by the earlier test
    if not os.path.exists(os.path.join(results, "s_0_checkpoint.msgpack")):
        pytest.skip("depends on test_cli_train_then_eval_sampling ordering")
    evals = str(root / "eval_tuned")
    cli(["eval", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--models_dir", results, "--save_dir", evals,
         "--k", "3", "--folds", "0", "--use_sampling", "--tune_sampling",
         "--num_tuning_samples", "2",
         "--samples_per_iteration", "24", "--resampling_iterations", "2",
         "--sampling_neighbors", "8", "--final_sample_size", "32"])
    assert os.path.exists(os.path.join(evals, "sampling_tuning.csv"))
    assert os.path.exists(os.path.join(evals, "summary.csv"))


def test_external_contours_loader(tmp_path):
    from hipt_abmil_atec23_tpu.slideio.seg import load_external_contours
    cts = np.array([
        np.array([[0, 0], [100, 0], [100, 100], [0, 100]]),
        np.array([[200, 200], [300, 200], [250, 300]]),
    ], dtype=object)
    path = str(tmp_path / "ext.npy")
    np.save(path, cts, allow_pickle=True)
    seg = load_external_contours(path)
    assert len(seg.contours) == 2
    assert seg.contours[0].shape == (4, 1, 2)
    assert seg.holes == [[], []]


def test_cli_eval_sampling_online_features(tmp_path):
    """eval --use_sampling --eval_features: DRAS inference that decodes and
    encodes ONLY the sampled patches on the fly (reference: --eval_features,
    eval_utils.py:231-260) — no precomputed feature artifacts at eval time."""
    from hipt_abmil_atec23_tpu.slideio import native
    from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide

    slides = tmp_path / "slides"
    slides.mkdir()
    rows = []
    for i in range(9):
        sid = f"sl{i:02d}"
        write_synthetic_slide(str(slides / f"{sid}.tif"), 1280, 1024,
                              n_levels=2,
                              compression=native.COMPRESSION_DEFLATE, seed=i)
        rows.append({"case_id": f"c{i:02d}", "slide_id": sid,
                     "label": "invalid" if i % 2 == 0 else "effective"})
    csv = str(tmp_path / "labels.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    tiles = str(tmp_path / "tiles")
    feats = str(tmp_path / "feats")
    results = str(tmp_path / "results")
    evals = str(tmp_path / "evals")

    cli(["tile", "--source", str(slides), "--save_dir", tiles,
         "--patch_size", "256", "--step_size", "256", "--use_otsu",
         "--a_t", "1"])
    # keep only slides that produced tissue coords (seed-dependent)
    tiled = {f[:-3] for f in os.listdir(os.path.join(tiles, "patches"))}
    df = pd.read_csv(csv)
    df[df["slide_id"].isin(tiled)].to_csv(csv, index=False)
    # train needs features once; the eval below does NOT read them
    cli(["encode", "--data_h5_dir", tiles, "--data_slide_dir", str(slides),
         "--feat_dir", feats, "--model_type", "resnet18",
         "--batch_size", "8", "--float32"])
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results,
         "--model_size", "tinier_resnet18", "--k", "3",
         "--max_epochs", "2", "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "8"])
    cli(["eval", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", str(tmp_path / "nonexistent_feats"),  # must be unused
         "--models_dir", results, "--save_dir", evals,
         "--model_size", "tinier_resnet18", "--k", "3", "--folds", "0",
         "--use_sampling", "--eval_features",
         "--data_slide_dir", str(slides), "--data_h5_dir", tiles,
         "--eval_encoder", "resnet18",
         "--samples_per_iteration", "6", "--resampling_iterations", "2",
         "--sampling_neighbors", "4", "--final_sample_size", "8"])
    fold0 = pd.read_csv(os.path.join(evals, "fold_0.csv"))
    assert {"slide_id", "Y", "Y_hat", "p_0", "p_1"} <= set(fold0.columns)
    assert np.isfinite(fold0[["p_0", "p_1"]].values).all()


def test_cli_export_roundtrip(tmp_path):
    """cli export writes a reference-layout torch state dict that converts
    back to identical flax params."""
    import jax
    import jax.numpy as jnp
    import torch

    from hipt_abmil_atec23_tpu.cli import main as cli
    from hipt_abmil_atec23_tpu.engine.checkpoint import save_params
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.models.convert import clam_params_from_torch

    model = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((8, 192), jnp.float32), None,
                        label=jnp.array(0), instance_eval=True)
    ckpt = str(tmp_path / "s_0_checkpoint.msgpack")
    save_params(ckpt, params)
    out = str(tmp_path / "s_0_checkpoint.pt")
    cli(["export", "--ckpt", ckpt, "--out", out,
         "--model_size", "hipt_smaller"])
    sd = torch.load(out, weights_only=False)
    assert "attention_net.0.weight" in sd
    back = clam_params_from_torch({k: v.numpy() for k, v in sd.items()})
    np.testing.assert_allclose(
        np.asarray(params["params"]["fc"]["kernel"]),
        np.asarray(back["params"]["fc"]["kernel"]), rtol=1e-6)


def test_cli_train_full_bag_sharded(tmp_path):
    """cli train --full_bag_sharded trains every fold on exact full bags."""
    import pandas as pd

    from hipt_abmil_atec23_tpu.cli import main as cli
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags

    bags = str(tmp_path / "bags")
    manifest, _ = make_synthetic_bags(bags, n_slides=18, feat_dim=192,
                                      signal=1.8, signal_fraction=0.5,
                                      bag_range=(100, 300), seed=4, fmt="pt")
    results = str(tmp_path / "results")
    cli(["train", "--task", "treatment", "--csv_path",
         os.path.join(bags, "labels.csv"), "--feat_dir", bags,
         "--results_dir", results, "--model_type", "clam_sb",
         "--model_size", "hipt_smaller", "--k", "3", "--max_epochs", "3",
         "--full_bag_sharded"])
    summary = pd.read_csv(os.path.join(results, "summary.csv"))
    assert len(summary) == 3 and np.isfinite(summary["val_auc"]).all()
    assert os.path.exists(os.path.join(results, "s_0_checkpoint.msgpack"))
    assert os.path.exists(os.path.join(results, "history_2.csv"))


def test_heatmap_confirm_prompt_declines(tmp_path):
    """--confirm prints the resolved config and gates on Y/N
    (reference: create_heatmaps.py:85-101); 'N' exits cleanly without
    running the job."""
    import json
    import subprocess
    import sys
    cfg = {"slide_dir": str(tmp_path), "save_dir": str(tmp_path / "out"),
           "ckpt_path": "missing.ckpt"}
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    r = subprocess.run(
        [sys.executable, "-m", "hipt_abmil_atec23_tpu.cli", "heatmap",
         "--config", str(cfg_path), "--confirm"],
        input="N\n", capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "slide_dir" in r.stdout and "Continue? Y/N" in r.stdout
    assert not os.path.exists(cfg["save_dir"])  # declined before running
