"""CLI plumbing coverage for flag clusters no other test exercises.

Each stage's behavior is unit/e2e-tested at the library level elsewhere;
these tests drive the argparse -> config plumbing (the layer where a flag
can silently not be wired through — reference CLI surfaces:
create_patches_fp.py:231-266, main.py:295-393, eval.py:19-89)."""
import os

import numpy as np
import pandas as pd
import pytest

from hipt_abmil_atec23_tpu.cli import main as cli
from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide


@pytest.fixture(scope="module")
def flag_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("flags")
    slides = root / "slides"
    slides.mkdir()
    rows = []
    for i in range(6):
        sid = f"fs{i:02d}"
        write_synthetic_slide(str(slides / f"{sid}.tif"), 1536, 1024,
                              n_levels=3,
                              compression=native.COMPRESSION_DEFLATE, seed=i)
        rows.append({"case_id": f"c{i:02d}", "slide_id": sid,
                     "label": "invalid" if i % 2 == 0 else "effective"})
    csv = root / "labels.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return root, str(slides), str(csv)


def test_tile_flag_cluster(flag_ws):
    """--preset CSV + --process_list (per-slide override, process=0
    exclusion) + --pad_slide + --no_stitch + --seg_level + --contour_fn +
    seg-param flags, through the CLI in one run."""
    root, slides, csv = flag_ws
    tiles = str(root / "tiles_flags")

    preset = str(root / "preset.csv")
    pd.DataFrame([{"sthresh": 15, "close": 2}]).to_csv(preset, index=False)
    plist = str(root / "process_list.csv")
    pd.DataFrame([
        {"slide_id": "fs00.tif", "process": 0},          # excluded
        {"slide_id": "fs01.tif", "a_t": 2},              # per-slide override
    ]).to_csv(plist, index=False)

    cli(["tile", "--source", slides, "--save_dir", tiles,
         "--patch_size", "256", "--step_size", "256", "--use_otsu",
         "--a_t", "1", "--a_h", "4", "--max_n_holes", "2", "--mthresh", "5",
         "--contour_fn", "four_pt_hard", "--seg_level", "1",
         "--preset", preset, "--process_list", plist,
         "--pad_slide", "--no_stitch", "--no_auto_skip"])

    proc = pd.read_csv(os.path.join(tiles,
                                    "process_list_autogen.csv")
                       ).set_index("slide_id")
    # process=0 slide untouched, everything else processed
    assert proc.loc["fs00.tif", "status"] == "tbp"
    assert (proc.drop("fs00.tif")["status"] == "processed").all()
    assert not os.path.exists(os.path.join(tiles, "patches", "fs00.h5"))
    # at least the default-a_t slides produced coords under this config
    # (the fs01 a_t override may legitimately filter everything out)
    assert len(os.listdir(os.path.join(tiles, "patches"))) >= 2
    # preset override landed in the journal; per-slide override beat it
    assert (proc["sthresh"] == 15).all() and (proc["close"] == 2).all()
    assert proc.loc["fs01.tif", "a_t"] == 2
    assert proc.drop(["fs00.tif", "fs01.tif"])["a_t"].eq(1).all()
    # --no_stitch: no stitch artifacts written
    assert os.listdir(os.path.join(tiles, "stitches")) == []


def test_splits_k2_empty_train_descriptor(flag_ws, tmp_path):
    """k=2 with val=next-fold leaves an EMPTY train split; the descriptor
    CSV must record zero counts instead of crashing on the empty (float-
    typed) index array (regression)."""
    root, slides, csv = flag_ws
    splits = str(tmp_path / "splits_k2")
    cli(["splits", "--task", "treatment", "--csv_path", csv,
         "--split_dir", splits, "--k", "2", "--seed", "1"])
    desc = pd.read_csv(os.path.join(splits, "splits_0_descriptor.csv"),
                       index_col=0)
    assert (desc["train"] == 0).all()           # train is empty at k=2
    assert desc["test"].sum() + desc["val"].sum() == 6


@pytest.fixture(scope="module")
def trained_ws(flag_ws):
    """tile + encode + splits shared by the train/eval/knn cluster tests."""
    root, slides, csv = flag_ws
    tiles, feats, splits = (str(root / d) for d in
                            ("tiles", "feats", "splits"))
    cli(["tile", "--source", slides, "--save_dir", tiles,
         "--patch_size", "256", "--step_size", "256", "--use_otsu",
         "--a_t", "1"])
    cli(["encode", "--data_h5_dir", tiles, "--data_slide_dir", slides,
         "--feat_dir", feats, "--model_type", "resnet18",
         "--batch_size", "8", "--float32"])
    cli(["splits", "--task", "treatment", "--csv_path", csv,
         "--split_dir", splits, "--k", "3", "--seed", "1"])
    return root, csv, feats, splits


def test_train_flag_cluster(trained_ws):
    """--bag_loss balanced_ce + --opt sgd + lr/reg/drop_out/bag_weight +
    --subtyping + --exp_code + --k_start/--k_end (single fold) +
    --epoch_chunk, then a --continue_training rerun."""
    root, csv, feats, splits = trained_ws
    results = str(root / "results_flags")
    args = ["train", "--task", "treatment", "--csv_path", csv,
            "--feat_dir", feats, "--results_dir", results,
            "--split_dir", splits, "--model_type", "clam_sb",
            "--model_size", "tinier_resnet18", "--k", "3",
            "--k_start", "1", "--k_end", "2",
            "--max_epochs", "2", "--min_epochs", "1", "--no_early_stopping",
            "--max_patches_per_slide", "8", "--epoch_chunk", "2",
            "--bag_loss", "balanced_ce", "--opt", "sgd",
            "--lr", "5e-4", "--reg", "1e-4", "--drop_out", "0.25",
            "--bag_weight", "0.5", "--B", "2", "--subtyping",
            "--exp_code", "flagcluster"]
    cli(args)
    # a partial fold range writes summary_partial_{start}_{end}.csv
    summary = pd.read_csv(os.path.join(results, "summary_partial_1_2.csv"))
    # k_start/k_end trained exactly fold 1
    assert list(summary["folds"]) == [1]
    assert np.isfinite(summary["test_auc"]).all()
    assert os.path.exists(os.path.join(results, "s_1_checkpoint.msgpack"))
    assert not os.path.exists(os.path.join(results,
                                           "s_0_checkpoint.msgpack"))
    # settings dump records the experiment code (reference: main.py:504-506)
    dumps = [f for f in os.listdir(results) if "flagcluster" in f]
    assert dumps, os.listdir(results)

    # --continue_training resumes from the fold checkpoint without error
    cli(args + ["--continue_training"])
    summary2 = pd.read_csv(os.path.join(results, "summary_partial_1_2.csv"))
    assert list(summary2["folds"]) == [1]
    assert np.isfinite(summary2["test_auc"]).all()


def test_eval_sampling_flag_cluster(trained_ws):
    """eval --use_sampling with the full DRAS flag surface: update rule,
    epsilon schedule, smoothing, --fully_random, --splits all, --folds."""
    root, csv, feats, splits = trained_ws
    results = str(root / "results_flags")
    evals = str(root / "eval_flags")
    cli(["eval", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--models_dir", results, "--save_dir", evals,
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--folds", "1", "--splits", "all",
         "--max_patches_per_slide", "8",
         "--use_sampling", "--sampling_type", "spatial",
         "--sampling_average", "--weight_smoothing", "0.1",
         "--sampling_random", "0.3", "--sampling_random_delta", "0.05",
         "--samples_per_iteration", "4", "--resampling_iterations", "2",
         "--sampling_neighbors", "2", "--final_sample_size", "4"])
    fold = pd.read_csv(os.path.join(evals, "fold_1.csv"))
    assert len(fold) == 6  # --splits all evaluates every slide
    assert np.isfinite(fold["p_1"]).all()

    # --fully_random replaces the attention-guided draw (reference:
    # eval.py --fully_random) — must run and score every slide too
    evals2 = str(root / "eval_flags_rand")
    cli(["eval", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--models_dir", results, "--save_dir", evals2,
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--folds", "1", "--max_patches_per_slide", "8",
         "--use_sampling", "--fully_random",
         "--samples_per_iteration", "4", "--resampling_iterations", "2",
         "--sampling_neighbors", "2", "--final_sample_size", "4"])
    assert os.path.exists(os.path.join(evals2, "fold_1.csv"))


def test_knn_agg_flags(trained_ws, capsys):
    """knn --agg max --temperature: the non-default aggregation path."""
    root, csv, feats, splits = trained_ws
    cli(["knn", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--k", "2", "--folds", "3",
         "--agg", "max", "--temperature", "0.5"])
    out = capsys.readouterr().out
    assert "auc" in out.lower()


def test_encode_flag_cluster(trained_ws, tmp_path):
    """encode --use_transforms + --slide_ext + --no_skip plumbing."""
    root, csv, feats, splits = trained_ws
    slides = str(root / "slides")
    tiles = str(root / "tiles")
    feats2 = str(tmp_path / "feats_tr")
    args = ["encode", "--data_h5_dir", tiles, "--data_slide_dir", slides,
            "--feat_dir", feats2, "--model_type", "resnet18",
            "--batch_size", "8", "--float32",
            "--use_transforms", "spatial", "--slide_ext", ".tif"]
    cli(args)
    pt_dir = os.path.join(feats2, "pt_files")
    assert len(os.listdir(pt_dir)) == 6
    # default rerun skips everything (mtimes unchanged)...
    mtimes = {f: os.path.getmtime(os.path.join(pt_dir, f))
              for f in os.listdir(pt_dir)}
    cli(args)
    assert all(os.path.getmtime(os.path.join(pt_dir, f)) == t
               for f, t in mtimes.items())
    # ...and --no_skip re-encodes (fresh artifacts)
    cli(args + ["--no_skip"])
    assert any(os.path.getmtime(os.path.join(pt_dir, f)) != t
               for f, t in mtimes.items())


def test_train_sampling_and_augment_flag_cluster(trained_ws, tmp_path):
    """Train-time DRAS via the CLI (--sampling --device_sampling
    --no_sampling_epochs + weight flags) and the bag-augmentation flags
    (--perturb_variance, --number_of_augs with {slide}augN.pt variants)."""
    import shutil

    root, csv, feats, splits = trained_ws
    results = str(tmp_path / "res_sampling")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results,
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--k_end", "1", "--max_epochs", "2",
         "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "8",
         "--sampling", "--device_sampling", "--no_sampling_epochs", "1",
         "--sampling_average", "--weight_smoothing", "0.1",
         "--samples_per_iteration", "4", "--resampling_iterations", "2",
         "--sampling_neighbors", "2", "--sampling_random", "0.3",
         "--sampling_random_delta", "0.05"])
    s = pd.read_csv(os.path.join(results, "summary_partial_0_1.csv"))
    assert np.isfinite(s["test_auc"]).all()

    # fabricate one pre-extracted augmentation variant per slide
    # (reference: {slide}augN.pt, dataset_generic.py:497-503)
    pt_dir = os.path.join(feats, "pt_files")
    for f in list(os.listdir(pt_dir)):
        if f.endswith(".pt") and "aug" not in f:
            shutil.copy(os.path.join(pt_dir, f),
                        os.path.join(pt_dir, f[:-3] + "aug1.pt"))
    results2 = str(tmp_path / "res_aug")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results2,
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--k_end", "1", "--max_epochs", "2",
         "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "8",
         "--perturb_variance", "0.1", "--number_of_augs", "1"])
    s2 = pd.read_csv(os.path.join(results2, "summary_partial_0_1.csv"))
    assert np.isfinite(s2["test_auc"]).all()


def test_tuning_flag_cluster(trained_ws, tmp_path):
    """--tuning with --tuning_output_file/--checkpoint_trials, a
    --resume_tuning rerun (skips finished trials), and the vmapped
    --trial_parallel search, all via the CLI."""
    root, csv, feats, splits = trained_ws
    results = str(tmp_path / "res_tune")
    out_csv = str(tmp_path / "tuning.csv")
    base = ["train", "--task", "treatment", "--csv_path", csv,
            "--feat_dir", feats, "--results_dir", results,
            "--split_dir", splits, "--model_size", "tinier_resnet18",
            "--k", "3", "--max_epochs", "2", "--min_epochs", "1",
            "--no_early_stopping", "--max_patches_per_slide", "8",
            "--tuning", "--num_tuning_samples", "2",
            "--tuning_output_file", out_csv]
    cli(base + ["--checkpoint_trials"])
    df = pd.read_csv(out_csv)
    assert len(df) == 2 and np.isfinite(df["last10_val_loss"]).all()
    # --checkpoint_trials persisted per-trial orbax state
    assert any("trial" in d for d in os.listdir(results)), \
        os.listdir(results)

    # resume: finished trials are skipped, CSV not duplicated
    cli(base + ["--resume_tuning"])
    df2 = pd.read_csv(out_csv)
    assert len(df2) == 2

    # vmapped trial-parallel search writes the same-schema CSV
    out_par = str(tmp_path / "tuning_par.csv")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", str(tmp_path / "res_tp"),
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--max_epochs", "2", "--min_epochs", "1",
         "--no_early_stopping", "--max_patches_per_slide", "8",
         "--tuning", "--num_tuning_samples", "2",
         "--tuning_output_file", out_par, "--trial_parallel"])
    dfp = pd.read_csv(out_par)
    assert len(dfp) == 2
    assert np.isfinite(dfp["last10_val_loss"]).all()


def test_misc_flag_cluster(trained_ws, tmp_path):
    """Remaining CLI plumbing: bootstrap --plot_roc/--roc_plot_path, train
    --profile/--trace/--grid_sample, serve daemon --poll_s/--max_drains,
    and the top-level --cpu backend switch."""
    root, csv, feats, splits = trained_ws
    results = str(tmp_path / "res_base")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", results,
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--k_end", "1", "--max_epochs", "1",
         "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "8"])

    # eval fold 0 (plain) to get a fold CSV for bootstrap
    evals = str(tmp_path / "ev_misc")
    cli(["eval", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--models_dir", results, "--save_dir", evals,
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--folds", "0", "--max_patches_per_slide", "8"])
    roc = str(tmp_path / "roc.png")
    cli(["--cpu", "bootstrap", "--dirs", evals, "--folds", "0",
         "--bootstraps", "500", "--out", str(tmp_path / "b.json"),
         "--plot_roc", "--roc_plot_path", roc])
    assert os.path.exists(roc) and os.path.getsize(roc) > 0

    # --profile (cProfile table) + --trace (JAX profiler dir) +
    # --grid_sample (grid-stratified DRAS init) in one sampling run
    trace_dir = str(tmp_path / "trace")
    cli(["train", "--task", "treatment", "--csv_path", csv,
         "--feat_dir", feats, "--results_dir", str(tmp_path / "res_misc"),
         "--split_dir", splits, "--model_size", "tinier_resnet18",
         "--k", "3", "--k_end", "1", "--max_epochs", "2",
         "--min_epochs", "1", "--no_early_stopping",
         "--max_patches_per_slide", "8",
         "--sampling", "--grid_sample", "--no_sampling_epochs", "1",
         "--samples_per_iteration", "4", "--resampling_iterations", "2",
         "--sampling_neighbors", "2",
         "--profile", "--trace", trace_dir])
    assert os.path.isdir(trace_dir) and os.listdir(trace_dir)

    # serve daemon mode through the CLI: one bounded drain then exit
    out = str(tmp_path / "serve_daemon")
    slides = str(root / "slides")
    cli(["serve", "--slide_dir", slides, "--out_dir", out,
         "--ckpt", os.path.join(results, "s_0_checkpoint.msgpack"),
         "--model_size", "tinier_resnet18", "--encoder", "resnet18",
         "--patch_size", "256", "--use_otsu", "--a_t", "1", "--float32",
         "--poll_s", "0.01", "--max_drains", "1", "--min_stable_s", "0"])
    assert os.path.exists(os.path.join(out, "serve_journal.csv"))
    assert os.path.exists(os.path.join(out, "predictions.jsonl"))


def test_heatmap_cmap_alpha(trained_ws):
    """heatmap --cmap/--alpha plumbing (non-default rendering params)."""
    root, csv, feats, splits = trained_ws
    slides = str(root / "slides")
    tiles = str(root / "tiles")
    results = str(root / "results_flags")
    hm = str(root / "hm_flags")
    cli(["heatmap", "--slide", os.path.join(slides, "fs00.tif"),
         "--coords_h5", os.path.join(tiles, "patches", "fs00.h5"),
         "--features", os.path.join(feats, "pt_files", "fs00.pt"),
         "--ckpt", os.path.join(results, "s_1_checkpoint.msgpack"),
         "--model_size", "tinier_resnet18", "--save_dir", hm,
         "--cmap", "viridis", "--alpha", "0.6"])
    assert any(f.endswith("_heatmap.jpg") for f in os.listdir(hm))
