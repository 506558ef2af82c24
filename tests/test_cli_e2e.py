"""Full pipeline end-to-end through the CLI: tile -> encode -> splits ->
train -> eval -> bootstrap -> heatmap on synthetic slides (SURVEY.md §4 #5)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from hipt_abmil_atec23_tpu.cli import main as cli
from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    slides = root / "slides"
    slides.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        sid = f"sl{i:02d}"
        write_synthetic_slide(str(slides / f"{sid}.tif"), 1536, 1024,
                              n_levels=3,
                              compression=native.COMPRESSION_DEFLATE, seed=i)
        rows.append({"case_id": f"c{i:02d}", "slide_id": sid,
                     "label": "invalid" if i % 2 == 0 else "effective"})
    csv = root / "labels.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return root, str(slides), str(csv)


def test_tile_encode_train_eval_bootstrap_heatmap(workspace):
    root, slides, csv = workspace
    tiles = str(root / "tiles")
    feats = str(root / "feats")
    splits = str(root / "splits")
    results = str(root / "results")
    evals = str(root / "eval")

    cli(["tile", "--source", slides, "--save_dir", tiles,
         "--patch_size", "256", "--step_size", "256", "--use_otsu",
         "--a_t", "1"])
    proc = pd.read_csv(os.path.join(tiles, "process_list_autogen.csv"))
    assert (proc["status"] == "processed").all(), proc
    assert len(os.listdir(os.path.join(tiles, "patches"))) == 8

    # resume: second run skips everything
    cli(["tile", "--source", slides, "--save_dir", tiles, "--a_t", "1"])
    proc = pd.read_csv(os.path.join(tiles, "process_list_autogen.csv"))
    assert (proc["status"] == "already_exist").all()

    cli(["encode", "--data_h5_dir", tiles, "--data_slide_dir", slides,
         "--feat_dir", feats, "--model_type", "resnet18",
         "--batch_size", "8", "--float32"])
    assert len(os.listdir(os.path.join(feats, "pt_files"))) == 8

    cli(["splits", "--task", "treatment", "--csv_path", csv,
         "--split_dir", splits, "--k", "3", "--seed", "1"])
    assert os.path.exists(os.path.join(splits, "splits_2_bool.csv"))

    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results,
         "--split_dir", splits, "--model_type", "clam_sb",
         "--model_size", "tinier_resnet18", "--k", "3",
         "--max_epochs", "2", "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "16", "--weighted_sample"])
    summary = pd.read_csv(os.path.join(results, "summary.csv"))
    assert len(summary) == 3 and np.isfinite(summary["test_auc"]).all()

    cli(["eval", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--models_dir", results, "--save_dir", evals,
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--max_patches_per_slide", "16"])
    assert os.path.exists(os.path.join(evals, "fold_2.csv"))

    out_json = str(root / "boot.json")
    cli(["bootstrap", "--dirs", evals, "--folds", "0", "1", "2",
         "--bootstraps", "2000", "--out", out_json])
    boot = json.load(open(out_json))
    assert "auc" in boot and "confusion_matrix" in boot
    assert 0 <= boot["auc"]["mean"] <= 1

    hm_dir = str(root / "heatmaps")
    cli(["heatmap", "--slide", os.path.join(slides, "sl00.tif"),
         "--coords_h5", os.path.join(tiles, "patches", "sl00.h5"),
         "--features", os.path.join(feats, "pt_files", "sl00.pt"),
         "--ckpt", os.path.join(results, "s_0_checkpoint.msgpack"),
         "--model_size", "tinier_resnet18", "--save_dir", hm_dir])
    files = os.listdir(hm_dir)
    assert any(f.endswith("_heatmap.jpg") for f in files)
    assert any("_blockmap" in f for f in files)
    assert sum(1 for f in files if "_roi" in f) == 8


def test_count_command(workspace, capsys):
    root, slides, csv = workspace
    tiles = str(root / "tiles")
    cli(["count", "--patches_dir", os.path.join(tiles, "patches"),
         "--csv_path", csv])
    out = capsys.readouterr().out
    assert "total" in out and "slides" in out
