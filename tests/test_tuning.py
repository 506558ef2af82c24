"""Hyperparameter tuning: spaces, ASHA, plateau stopper, full search run."""
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.engine.tune import (
    Uniform, LogUniform, Choice, GridSearch, sample_configs,
    TrialPlateauStopper, ASHAScheduler, apply_trial_config, run_tuning)
from hipt_abmil_atec23_tpu.utils.config import (
    ExperimentConfig, BagConfig, ModelConfig, TrainConfig, TaskConfig)


def test_sample_configs_grid_cross():
    space = {"lr": LogUniform(1e-4, 1e-2),
             "model_size": GridSearch(["hipt_small", "hipt_smaller"])}
    cfgs = sample_configs(space, 3, seed=0)
    assert len(cfgs) == 6  # 3 samples x 2 grid values
    assert all(1e-4 <= c["lr"] <= 1e-2 for c in cfgs)
    sizes = {c["model_size"] for c in cfgs}
    assert sizes == {"hipt_small", "hipt_smaller"}


def test_plateau_stopper_on_flat_and_rising():
    s = TrialPlateauStopper(std=0.01, num_results=3, grace_period=3)
    flat = [1.0, 1.0, 1.0, 1.0]
    assert any(s(v) for v in flat)
    s2 = TrialPlateauStopper(std=1e-9, num_results=3, grace_period=3)
    rising = [1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.2, 2.4]
    assert any(s2(v) for v in rising)
    s3 = TrialPlateauStopper(std=1e-9, num_results=3, grace_period=3)
    falling = [2.0, 1.8, 1.6, 1.4, 1.2, 1.0, 0.8]
    assert not any(s3(v) for v in falling)


def test_asha_kills_bottom_of_rung():
    asha = ASHAScheduler(max_t=32, grace_period=4, reduction_factor=2)
    assert asha.rungs == [4, 8, 16]
    # three trials report at rung 4; worst should be stopped
    assert not asha.should_stop(4, 0.5)   # first: no peers
    assert not asha.should_stop(4, 0.4)   # second: top half
    assert asha.should_stop(4, 0.9)       # third: bottom
    assert not asha.should_stop(3, 99.0)  # non-rung epochs never stop


def test_apply_trial_config():
    cfg = ExperimentConfig(task=TaskConfig(), bags=BagConfig(),
                           model=ModelConfig(), train=TrainConfig())
    out = apply_trial_config(cfg, {"lr": 3e-4, "drop_out": 0.5,
                                   "model_size": "hipt_big", "B": 16,
                                   "max_patches_per_slide": 150,
                                   "reg": 1e-3})
    assert out.train.lr == 3e-4 and out.train.reg == 1e-3
    assert out.model.drop_out == 0.5 and out.model.model_size == "hipt_big"
    assert out.model.k_sample == 16
    assert out.bags.max_patches_per_slide == 150
    assert cfg.train.lr != 3e-4  # original untouched


def test_run_tuning_end_to_end(tmp_path):
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    manifest, store = make_synthetic_bags(str(tmp_path / "bags"), n_slides=24,
                                          feat_dim=192, signal=1.5,
                                          signal_fraction=0.4, seed=2)
    cfg = ExperimentConfig(
        exp_code="tune", results_dir=str(tmp_path / "results"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=32, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=6, min_epochs=1, early_stopping=False,
                          k=3, seed=0, weighted_sample=True))
    folds = make_fold_datasets(manifest, store, cfg, 0)
    space = {"lr": Choice([1e-3, 1e-4]), "drop_out": Choice([0.0, 0.25])}
    out_csv = str(tmp_path / "tuning.csv")
    best, df, trials = run_tuning(cfg, folds, manifest.class_counts(),
                                  space=space, num_samples=3, max_epochs=6,
                                  grace_period=3, output_csv=out_csv,
                                  verbose=False, seed=1)
    assert len(trials) == 3
    assert set(best) == {"lr", "drop_out"}
    assert df["last10_val_loss"].notna().all()
    import os
    assert os.path.exists(out_csv)


def test_run_tuning_orbax_trial_checkpoints(tmp_path):
    """checkpoint_trials writes per-epoch orbax train-state checkpoints
    (params + optimizer, bounded retention) that restore exactly — the
    reference's per-epoch tuning checkpoints (core_utils_tuning.py:235-240)."""
    import os
    import jax
    import numpy as np
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    from hipt_abmil_atec23_tpu.engine.checkpoint import TrainStateCheckpointer
    from hipt_abmil_atec23_tpu.engine.train import build_step_fns

    manifest, store = make_synthetic_bags(str(tmp_path / "bags"), n_slides=12,
                                          feat_dim=192, seed=3,
                                          bag_range=(24, 33))
    cfg = ExperimentConfig(
        exp_code="tune_ckpt", results_dir=str(tmp_path / "results"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=16, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=3, min_epochs=1, early_stopping=False,
                          k=3, seed=0))
    folds = make_fold_datasets(manifest, store, cfg, 0)
    best, df, trials = run_tuning(
        cfg, folds, manifest.class_counts(),
        space={"lr": Choice([1e-3])}, num_samples=2, max_epochs=3,
        grace_period=3, use_plateau_stopper=False, verbose=False, seed=1,
        checkpoint_trials=True, max_ckpts_to_keep=2)
    for ti in range(2):
        ckpt_dir = os.path.join(cfg.results_dir, f"trial_{ti}", "ckpts")
        ckptr = TrainStateCheckpointer(ckpt_dir, max_to_keep=2)
        assert ckptr.latest_step() == 2          # epochs 0..2
        # retention: only max_to_keep steps remain on disk
        steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
        assert steps == [1, 2]
        n_pad = max(d.pad_size() for d in folds)
        fns = build_step_fns(cfg, manifest.class_counts(), n_pad, 192)
        template = fns.init_params(jax.random.PRNGKey(0))
        params, opt_state, step = ckptr.restore(
            template, fns.tx.init(template))
        assert step == 2
        chex_leaves = jax.tree.leaves(params)
        assert all(np.isfinite(np.asarray(x)).all() for x in chex_leaves)
        ckptr.close()


def test_run_tuning_resume(tmp_path):
    """resume=True re-reads completed trials from the results CSV and runs
    only the remainder (Tuner.restore analog, reference main.py:259-263)."""
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    manifest, store = make_synthetic_bags(str(tmp_path / "bags"), n_slides=12,
                                          feat_dim=192, seed=4,
                                          bag_range=(24, 33))
    cfg = ExperimentConfig(
        exp_code="tune_resume", results_dir=str(tmp_path / "results"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=16, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=2, min_epochs=1, early_stopping=False,
                          k=3, seed=0))
    folds = make_fold_datasets(manifest, store, cfg, 0)
    space = {"lr": Choice([1e-3, 3e-4, 1e-4])}
    out_csv = str(tmp_path / "tuning.csv")

    # first process: 2 of 4 trials
    _, df1, t1 = run_tuning(cfg, folds, manifest.class_counts(), space=space,
                            num_samples=2, max_epochs=2, grace_period=2,
                            use_plateau_stopper=False, output_csv=out_csv,
                            verbose=False, seed=7)
    assert len(df1) == 2 and len(t1) == 2

    # resumed process asks for 4: only 2 new trials run
    best, df2, t2 = run_tuning(cfg, folds, manifest.class_counts(),
                               space=space, num_samples=4, max_epochs=2,
                               grace_period=2, use_plateau_stopper=False,
                               output_csv=out_csv, verbose=False, seed=7,
                               resume=True)
    assert len(t2) == 2          # newly run only
    assert len(df2) == 4         # full history
    # first two rows identical to the first process's results
    np.testing.assert_allclose(df2["last10_val_loss"].values[:2],
                               df1["last10_val_loss"].values, rtol=1e-6)
    assert "lr" in best


def test_state_cb_chunked_fires_on_consistent_state_only(tmp_path):
    """In the epoch_chunk path params snapshots are per-epoch but optimizer
    state is end-of-chunk; the train-state hook must only fire where the two
    belong to the same step (chunk boundaries)."""
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    from hipt_abmil_atec23_tpu.engine.train import train_fold
    import dataclasses

    manifest, store = make_synthetic_bags(str(tmp_path / "bags"), n_slides=12,
                                          feat_dim=192, seed=5,
                                          bag_range=(24, 33))
    cfg = ExperimentConfig(
        exp_code="chunk_cb", results_dir=str(tmp_path / "results"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=16, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=4, min_epochs=1, early_stopping=False,
                          k=3, seed=0, epoch_chunk=2))
    tr, va, te = make_fold_datasets(manifest, store, cfg, 0)
    seen = []
    train_fold(cfg, 0, tr, va, te, manifest.class_counts(), verbose=False,
               state_cb=lambda e, p, o: seen.append(e))
    assert seen == [1, 3]  # chunk boundaries only (chunks of 2 over 4 epochs)

    # per-epoch path: every epoch
    cfg1 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epoch_chunk=1),
        results_dir=str(tmp_path / "results1"))
    seen1 = []
    train_fold(cfg1, 0, tr, va, te, manifest.class_counts(), verbose=False,
               state_cb=lambda e, p, o: seen1.append(e))
    assert seen1 == [0, 1, 2, 3]
