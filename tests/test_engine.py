"""End-to-end engine tests on synthetic feature bags (SURVEY.md §4 plan #5)."""
import os

import numpy as np
import pandas as pd
import pytest

from hipt_abmil_atec23_tpu.data.synthetic import make_synthetic_bags
from hipt_abmil_atec23_tpu.data.splits import (
    generate_kfold_splits, save_split_csv, load_split_csv, check_split_disjoint)
from hipt_abmil_atec23_tpu.engine.experiment import run_cv
from hipt_abmil_atec23_tpu.utils.config import (
    ExperimentConfig, BagConfig, ModelConfig, TrainConfig, TaskConfig)


def _cfg(tmp_path, **over):
    base = dict(
        exp_code="t", results_dir=str(tmp_path / "results"),
        task=TaskConfig(name="synth", n_classes=2,
                        label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=64, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          drop_out=0.0),
        train=TrainConfig(lr=1e-3, reg=1e-5, max_epochs=25, min_epochs=2,
                          early_stopping=False, k=3, seed=3,
                          weighted_sample=True, bag_loss="ce"),
    )
    base.update(over)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("bags")
    return make_synthetic_bags(str(d), n_slides=48, feat_dim=192,
                               signal=1.5, signal_fraction=0.4, seed=1)


def test_cv_learns_synthetic_signal(synth, tmp_path):
    manifest, store = synth
    cfg = _cfg(tmp_path)
    summary, results = run_cv(cfg, manifest, store, verbose=False)
    assert len(results) == 3
    assert summary["test_auc"].mean() > 0.8, summary
    assert os.path.exists(os.path.join(cfg.results_dir, "summary.csv"))
    assert os.path.exists(os.path.join(cfg.results_dir, "fold_0.csv"))
    assert os.path.exists(os.path.join(cfg.results_dir, "s_0_checkpoint.msgpack"))
    fold0 = pd.read_csv(os.path.join(cfg.results_dir, "fold_0.csv"))
    assert {"slide_id", "Y", "Y_hat", "p_0", "p_1"} <= set(fold0.columns)


def test_determinism_same_seed(synth, tmp_path):
    manifest, store = synth
    cfg1 = _cfg(tmp_path / "a", train=TrainConfig(
        lr=1e-3, max_epochs=2, min_epochs=1, early_stopping=False, k=3,
        k_end=1, seed=7))
    cfg2 = _cfg(tmp_path / "b", train=TrainConfig(
        lr=1e-3, max_epochs=2, min_epochs=1, early_stopping=False, k=3,
        k_end=1, seed=7))
    s1, _ = run_cv(cfg1, manifest, store, verbose=False)
    s2, _ = run_cv(cfg2, manifest, store, verbose=False)
    np.testing.assert_allclose(s1["test_auc"], s2["test_auc"], rtol=1e-6)


def test_abmil_mode_no_inst_cluster(synth, tmp_path):
    """Winning-config shape: CLAM_SB + --no_inst_cluster == pure ABMIL."""
    manifest, store = synth
    cfg = _cfg(tmp_path, model=ModelConfig(
        model_type="clam_sb", model_size="hipt_smaller", drop_out=0.0,
        no_inst_cluster=True))
    summary, _ = run_cv(cfg, manifest, store, verbose=False)
    assert summary["test_auc"].mean() > 0.75


def test_mil_fc_model_trains(synth, tmp_path):
    manifest, store = synth
    cfg = _cfg(tmp_path, model=ModelConfig(model_type="mil", model_size="small"))
    # MIL_fc expects 1024-d 'small'; regenerate 1024-d bags
    d2 = tmp_path / "bags1024"
    manifest2, store2 = make_synthetic_bags(str(d2), n_slides=24,
                                            feat_dim=1024, seed=2)
    cfg.train.max_epochs = 4
    summary, _ = run_cv(cfg, manifest2, store2, verbose=False)
    assert np.isfinite(summary["test_auc"]).all()


def test_split_csv_roundtrip(synth, tmp_path):
    manifest, _ = synth
    splits = generate_kfold_splits(manifest.labels, 5, seed=1)
    for s in splits:
        check_split_disjoint(s)
    path = str(tmp_path / "splits_0.csv")
    save_split_csv(path, list(manifest.slide_ids), splits[0])
    tr, va, te = load_split_csv(path)
    assert set(tr) == {manifest.slide_ids[i] for i in splits[0][0]}
    assert set(te) == {manifest.slide_ids[i] for i in splits[0][2]}
    # val = next fold's test (reference: utils/utils.py:142-152)
    assert set(va) == {manifest.slide_ids[i] for i in splits[1][2]}


def test_early_stopping_schedule():
    from hipt_abmil_atec23_tpu.engine.train import EarlyStopper
    es = EarlyStopper(min_epochs=3, patience=2, stop_epoch=4)
    # warmup: always save
    assert es.update(0, 1.0) and es.update(1, 2.0) and es.update(2, 1.5)
    assert not es.early_stop
    # first post-warmup epoch establishes best
    assert es.update(3, 1.2)
    # worse epochs accumulate patience; stop only past stop_epoch
    assert not es.update(4, 1.3)
    assert not es.early_stop
    assert not es.update(5, 1.4)
    assert es.early_stop
    # improvement resets
    es2 = EarlyStopper(min_epochs=0, patience=2, stop_epoch=0)
    es2.update(0, 1.0)
    es2.update(1, 2.0)
    assert es2.update(2, 0.5) and es2.counter == 0
    # EQUAL val loss counts as improvement: checkpoint + counter reset
    # (reference: non-improvement branch is strict score < best_score,
    # core_utils.py:80-88 — a flat plateau never early-stops)
    es3 = EarlyStopper(min_epochs=0, patience=2, stop_epoch=0)
    es3.update(0, 1.0)
    for e in range(1, 6):
        assert es3.update(e, 1.0) and es3.counter == 0
    assert not es3.early_stop


def test_val_loss_uses_configured_bag_loss():
    """Early stopping ranks epochs by the CONFIGURED loss: with
    bag_loss='svm', eval_batch must return per-slide SmoothTop1SVM, not
    plain CE (reference: validate() applies loss_fn, core_utils.py:464)."""
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.train import build_step_fns
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TrainConfig, TaskConfig)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(4, 16, 192)).astype(np.float32)
    mask = np.ones((4, 16), bool)
    labels = np.array([0, 1, 0, 1], np.int32)

    def run(bag_loss):
        cfg = ExperimentConfig(
            task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
            bags=BagConfig(max_patches_per_slide=16),
            model=ModelConfig(model_type="clam_sb",
                              model_size="hipt_smaller",
                              no_inst_cluster=True),
            train=TrainConfig(bag_loss=bag_loss))
        fns = build_step_fns(cfg, np.array([2, 2]), 16, 192)
        params = fns.init_params(jax.random.PRNGKey(0))
        probs, losses, _ = fns.eval_batch(params, jnp.asarray(feats),
                                          jnp.asarray(mask),
                                          jnp.asarray(labels))
        return np.asarray(probs), np.asarray(losses)

    probs_ce, loss_ce = run("ce")
    probs_svm, loss_svm = run("svm")
    np.testing.assert_allclose(probs_ce, probs_svm, atol=1e-6)  # same model
    # ce path is the NLL of the predicted prob
    np.testing.assert_allclose(
        loss_ce, -np.log(probs_ce[np.arange(4), labels]), atol=1e-5)
    # svm path is L = logsumexp(s + alpha*(1-onehot)) - s_y, not NLL
    assert not np.allclose(loss_ce, loss_svm, atol=1e-4)
    logits = np.log(probs_svm)  # softmax is shift-invariant; use logp
    aug = logits + (1.0 - np.eye(2)[labels])
    want = (np.log(np.exp(aug).sum(1))
            - logits[np.arange(4), labels])
    np.testing.assert_allclose(loss_svm, want, atol=1e-4)


def test_multiclass_subtyping_cv(tmp_path):
    """5-class ovarian-style task: CLAM_MB + subtyping instance loss +
    multiclass OVR AUC through the full CV driver."""
    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags5"), n_slides=40, feat_dim=192, n_classes=5,
        signal=2.0, signal_fraction=0.5, seed=6)
    cfg = ExperimentConfig(
        exp_code="mc", results_dir=str(tmp_path / "results5"),
        task=TaskConfig(name="ovarian5", n_classes=5,
                        label_dict={str(i): i for i in range(5)}),
        bags=BagConfig(max_patches_per_slide=32, batch_size=1),
        model=ModelConfig(model_type="clam_mb", model_size="hipt_smaller",
                          subtyping=True, k_sample=4),
        train=TrainConfig(lr=1e-3, max_epochs=4, min_epochs=1,
                          early_stopping=False, k=4, k_end=1, seed=2,
                          weighted_sample=True, bag_loss="balanced_ce"))
    summary, results = run_cv(cfg, manifest, store, verbose=False)
    assert np.isfinite(summary["test_auc"]).all()
    # per-slide CSV has all 5 probability columns
    fold0 = pd.read_csv(os.path.join(cfg.results_dir, "fold_0.csv"))
    assert {"p_0", "p_1", "p_2", "p_3", "p_4"} <= set(fold0.columns)
    probs = fold0[[f"p_{c}" for c in range(5)]].values
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)


def test_epoch_chunked_training_matches_semantics(synth, tmp_path):
    """epoch_chunk>1 fuses epochs per dispatch; results stay deterministic
    and the early-stopping schedule still checkpoints per epoch."""
    manifest, store = synth
    import dataclasses
    base = _cfg(tmp_path / "chunk", train=TrainConfig(
        lr=1e-3, reg=1e-5, max_epochs=9, min_epochs=2, early_stopping=True,
        patience=2, stop_epoch=2, k=3, k_end=1, seed=5, weighted_sample=True))
    cfg_chunked = dataclasses.replace(
        base, train=dataclasses.replace(base.train, epoch_chunk=4))
    s_chunk, res_chunk = run_cv(cfg_chunked, manifest, store, verbose=False)
    assert np.isfinite(s_chunk["test_auc"]).all()
    # per-epoch history fully recorded despite fused dispatch
    assert len(res_chunk[0].history) >= 3
    assert all("val_auc" in h for h in res_chunk[0].history)
    # checkpoint exists (early-stopping schedule saved snapshots)
    assert os.path.exists(os.path.join(cfg_chunked.results_dir,
                                       "s_0_checkpoint.msgpack"))


def test_fused_full_bag_eval_route(tmp_path):
    """evaluate_fold auto-routes un-subsampled large bags through the fused
    full-bag path and matches the padded-batch evaluator's predictions."""
    from hipt_abmil_atec23_tpu.data.bags import BagDataset
    from hipt_abmil_atec23_tpu.engine.checkpoint import ckpt_path, save_params
    from hipt_abmil_atec23_tpu.engine.evaluate import (
        FUSED_EVAL_MIN_BAG, evaluate_fold, evaluate_full_bags_fused)
    from hipt_abmil_atec23_tpu.engine.train import build_step_fns, evaluate_split
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)
    import jax
    import jax.numpy as jnp

    manifest, store = make_synthetic_bags(
        str(tmp_path / "bags"), n_slides=6, feat_dim=192,
        bag_range=(FUSED_EVAL_MIN_BAG + 10, FUSED_EVAL_MIN_BAG + 200),
        signal=2.0, signal_fraction=0.5, seed=1)
    cfg = ExperimentConfig(
        exp_code="fused", results_dir=str(tmp_path / "m"),
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=None, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller",
                          no_inst_cluster=True),
        train=TrainConfig(k=3, seed=0))
    ds = BagDataset(list(manifest.slide_ids), manifest.labels, store,
                    cfg.bags)
    n_pad = ds.pad_size()
    assert n_pad >= FUSED_EVAL_MIN_BAG
    fns = build_step_fns(cfg, manifest.class_counts(), n_pad, 192)
    params = fns.init_params(jax.random.PRNGKey(0))
    os.makedirs(cfg.results_dir, exist_ok=True)
    save_params(ckpt_path(cfg.results_dir, 0), params)

    res = evaluate_fold(cfg, 0, ds, manifest.class_counts(), cfg.results_dir)
    probs_fused, loss_fused = evaluate_full_bags_fused(cfg, ds, params, n_pad)
    rng = np.random.default_rng(7)
    probs_pad, loss_pad = evaluate_split(fns, params, ds, n_pad, rng)
    np.testing.assert_allclose(probs_fused, probs_pad, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res.test_probs, probs_pad, rtol=1e-4,
                               atol=1e-5)
    assert abs(loss_fused - loss_pad) < 1e-4
