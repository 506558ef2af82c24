"""Trial-parallel tuning: vmapped (lr, reg) trials on one fold."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.engine.tune_parallel import (
    adam_l2_update, run_trials_parallel)


def test_adam_l2_matches_optax_chain(rng):
    """Manual traced-lr Adam == optax.chain(add_decayed_weights, adam),
    the sequential trainer's optimizer (engine/train.make_optimizer)."""
    import optax
    lr, reg = 3e-3, 1e-2
    params = {"w": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(3,)).astype(np.float32))}
    tx = optax.chain(optax.add_decayed_weights(reg), optax.adam(lr))
    opt_state = tx.init(params)
    p_ref = params
    p_mine = params
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    count = jnp.asarray(0)
    for i in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32)), p_ref)
        updates, opt_state = tx.update(grads, opt_state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_mine, mu, nu, count = adam_l2_update(p_mine, grads, mu, nu, count,
                                               lr, reg)
        for k in ("w", "b"):
            np.testing.assert_allclose(np.asarray(p_mine[k]),
                                       np.asarray(p_ref[k]),
                                       rtol=1e-5, atol=1e-6)


def test_run_trials_parallel_selects_sane_lr(tmp_path):
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    from hipt_abmil_atec23_tpu.parallel.mesh import make_mesh
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)

    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags"), n_slides=24, feat_dim=192, signal=1.5,
        signal_fraction=0.4, seed=3)
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=32, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=10, early_stopping=False, k=3, seed=0,
                          weighted_sample=True))
    folds = make_fold_datasets(manifest, store, cfg, 0)
    lrs = np.array([1e-3, 25.0, 1e-8], np.float32)   # sane / divergent / dead
    regs = np.array([1e-5, 1e-5, 1e-5], np.float32)
    mesh = None
    import jax as _jax
    if len(_jax.devices()) >= 3:
        # trials shard over devices (pad count not needed: vmap handles 3)
        mesh = None  # keep single-device vmap; mesh sharding needs T % devs == 0
    res = run_trials_parallel(cfg, folds, manifest.class_counts(), lrs, regs,
                              max_epochs=10, mesh=mesh, verbose=False)
    assert res.val_loss.shape == (3, 10)
    assert res.best_trial == 0 and res.best_lr == pytest.approx(1e-3)
    # the sane trial actually learned: its loss beats both pathological ones
    finals = res.val_loss[:, -3:].mean(1)
    assert finals[0] < np.nan_to_num(finals[1], nan=np.inf)
    assert finals[0] < finals[2]


def test_run_trials_parallel_on_mesh(tmp_path):
    """4 trials sharded over a 4-device trial axis."""
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    from hipt_abmil_atec23_tpu.parallel.mesh import make_mesh
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)
    import jax as _jax

    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags"), n_slides=18, feat_dim=192, seed=5)
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=16, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=2, early_stopping=False, k=3, seed=0))
    folds = make_fold_datasets(manifest, store, cfg, 0)
    mesh = make_mesh([("trial", 4)], devices=_jax.devices()[:4])
    lrs = np.array([1e-2, 1e-3, 1e-4, 1e-5], np.float32)
    regs = np.full(4, 1e-5, np.float32)
    res = run_trials_parallel(cfg, folds, manifest.class_counts(), lrs, regs,
                              max_epochs=2, mesh=mesh, verbose=False)
    assert np.isfinite(res.val_loss).all()


def test_hetero_tuning_beats_sequential_wallclock(tmp_path):
    """VERDICT r1 #7 done-criterion: a tuning run over a reference-style
    heterogeneous grid (lr x reg x model_size — main.py:54-206 shapes)
    buckets by static shape, vmaps within buckets over the 8-device mesh,
    and beats the sequential tuner's wall-clock on the same 16 configs."""
    import time

    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    from hipt_abmil_atec23_tpu.engine.tune import GridSearch, run_tuning
    from hipt_abmil_atec23_tpu.engine.tune_parallel import (
        _bucket_key, run_tuning_hetero)
    from hipt_abmil_atec23_tpu.parallel.mesh import make_mesh
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)

    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags"), n_slides=24, feat_dim=192, signal=1.5,
        signal_fraction=0.4, bag_range=(40, 80), seed=5)
    cfg = ExperimentConfig(
        exp_code="hetero", results_dir=str(tmp_path / "results"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=32, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=8, early_stopping=False, k=3, seed=0,
                          weighted_sample=True))
    class_counts = manifest.class_counts()
    # reference-style grid: 4 lr x 2 reg x 2 sizes = 16 trials, 2 buckets
    space = {"lr": GridSearch([3e-3, 1e-3, 3e-4, 1e-4]),
             "reg": GridSearch([1e-5, 1e-3]),
             "model_size": GridSearch(["hipt_smaller", "hipt_smallest"])}

    mesh = make_mesh([("trial", 8)])
    t0 = time.perf_counter()
    best, df = run_tuning_hetero(
        cfg, manifest, store, class_counts, space=space, num_samples=1,
        mesh=mesh, grace_period=8, seed=0, verbose=False)
    t_hetero = time.perf_counter() - t0

    assert len(df) == 16
    assert set(df["model_size"]) == {"hipt_smaller", "hipt_smallest"}
    assert best["lr"] in (3e-3, 1e-3, 3e-4, 1e-4)
    assert np.isfinite(df["last10_val_loss"]).all()
    keys = {_bucket_key(r) for r in df[["model_size"]].to_dict("records")}
    assert len(keys) == 2

    t0 = time.perf_counter()
    folds = make_fold_datasets(manifest, store, cfg, 0)
    best_seq, df_seq, _ = run_tuning(
        cfg, folds, class_counts, space=space, num_samples=1,
        grace_period=8, use_plateau_stopper=False, seed=0, verbose=False)
    t_seq = time.perf_counter() - t0

    assert len(df_seq) == 16
    # the vmapped buckets amortize 16 trials into 2 compiled programs
    assert t_hetero < t_seq, (t_hetero, t_seq)


def test_hetero_asha_kills_diverging_trials(tmp_path):
    """A divergent-lr trial inside a bucket gets ASHA-killed (stopped_epoch
    recorded) while sane trials run to completion."""
    from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    from hipt_abmil_atec23_tpu.engine.tune import ASHAScheduler
    from hipt_abmil_atec23_tpu.engine.tune_parallel import run_trials_parallel
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)

    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags"), n_slides=24, feat_dim=192, signal=1.5,
        signal_fraction=0.4, seed=3)
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=32, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(max_epochs=12, early_stopping=False, k=3, seed=0,
                          weighted_sample=True))
    folds = make_fold_datasets(manifest, store, cfg, 0)
    asha = ASHAScheduler(max_t=12, grace_period=3, reduction_factor=2)
    res = run_trials_parallel(
        cfg, folds, manifest.class_counts(),
        np.array([1e-3, 1e-3, 50.0, 40.0], np.float32),
        np.array([1e-5, 1e-5, 1e-5, 1e-5], np.float32),
        asha=asha, verbose=False)
    # the divergent trials die at a rung; a sane trial survives longer
    assert res.stopped_epoch is not None
    assert res.stopped_epoch[2:].max() < 11, res.stopped_epoch
    assert res.best_trial in (0, 1)
    assert np.isnan(res.val_loss[2, -1]) or np.isnan(res.val_loss[3, -1])
