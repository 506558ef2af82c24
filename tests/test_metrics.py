"""Metrics: sklearn parity and bootstrap vectorization correctness."""
import os
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.engine.metrics import (
    binary_auc, multiclass_auc_ovr, auc_score, f1_binary, balanced_accuracy,
    accuracy, confusion_matrix, bootstrap_metrics, ClassAccuracyLogger,
)


def test_binary_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score
    for _ in range(5):
        y = rng.integers(0, 2, size=200)
        s = rng.normal(size=200)
        np.testing.assert_allclose(binary_auc(y, s), roc_auc_score(y, s),
                                   rtol=1e-12)


def test_binary_auc_with_ties(rng):
    from sklearn.metrics import roc_auc_score
    y = rng.integers(0, 2, size=300)
    s = rng.integers(0, 5, size=300).astype(float)  # heavy ties
    np.testing.assert_allclose(binary_auc(y, s), roc_auc_score(y, s), rtol=1e-12)


def test_multiclass_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score
    y = rng.integers(0, 3, size=200)
    p = rng.dirichlet(np.ones(3), size=200)
    ours = multiclass_auc_ovr(y, p)
    # reference uses per-class roc_curve+auc == ovr macro without averaging
    # over label weights
    ref = np.mean([roc_auc_score((y == c).astype(int), p[:, c])
                   for c in range(3)])
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_f1_and_balanced_acc_match_sklearn(rng):
    from sklearn.metrics import f1_score, balanced_accuracy_score
    y = rng.integers(0, 2, size=150)
    p = rng.integers(0, 2, size=150)
    np.testing.assert_allclose(f1_binary(y, p), f1_score(y, p), rtol=1e-12)
    np.testing.assert_allclose(balanced_accuracy(y, p, 2),
                               balanced_accuracy_score(y, p), rtol=1e-12)


def test_bootstrap_statistics_consistent(rng):
    """Vectorized bootstrap must agree with a small explicit numpy loop."""
    from sklearn.metrics import roc_auc_score
    n = 60
    y = rng.integers(0, 2, size=n)
    p1 = np.clip(y * 0.4 + rng.normal(0, 0.3, size=n) + 0.3, 0, 1)
    probs = np.stack([1 - p1, p1], axis=1)

    res = bootstrap_metrics(y, probs, n_bootstraps=3000, seed=0, batch=1500)
    assert res.auc.shape == (3000,)
    # explicit loop estimate of the same statistic's distribution
    loop_rng = np.random.default_rng(0)
    loop_aucs, loop_accs = [], []
    preds = probs.argmax(1)
    for _ in range(3000):
        idx = loop_rng.integers(0, n, size=n)
        if len(np.unique(y[idx])) == 2:
            loop_aucs.append(roc_auc_score(y[idx], p1[idx]))
        loop_accs.append(np.mean(preds[idx] == y[idx]))
    np.testing.assert_allclose(np.nanmean(res.auc), np.mean(loop_aucs), atol=0.01)
    np.testing.assert_allclose(np.nanmean(res.acc), np.mean(loop_accs), atol=0.01)
    np.testing.assert_allclose(np.nanstd(res.auc), np.std(loop_aucs), atol=0.01)


def test_bootstrap_auc_exact_on_identity_resample(rng):
    """A resample equal to the full dataset must reproduce the plain AUC."""
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.metrics import _weighted_auc
    n = 40
    y = rng.integers(0, 2, size=n).astype(np.int32)
    s = rng.normal(size=n).astype(np.float32)
    idx = np.arange(n)[None, :]  # identity resample
    out = np.asarray(_weighted_auc(jnp.asarray(y), jnp.asarray(s),
                                   jnp.asarray(idx)))[0]
    np.testing.assert_allclose(out, binary_auc(y, s), rtol=1e-5)


def test_confusion_and_logger(rng):
    y = np.array([0, 0, 1, 1, 1])
    p = np.array([0, 1, 1, 1, 0])
    cm = confusion_matrix(y, p, 2)
    assert cm.tolist() == [[1, 1], [1, 2]]
    logger = ClassAccuracyLogger(2)
    logger.log_batch(p, y)
    acc1, correct1, count1 = logger.summary(1)
    assert (correct1, count1) == (2, 3)


def test_roc_curve_matches_sklearn(rng):
    """roc_curve_points reproduces sklearn's ROC curve + trapezoid AUC
    (reference plots these at bootstrapping.py:69-77)."""
    from sklearn.metrics import auc as sk_auc
    from sklearn.metrics import roc_curve as sk_roc
    from hipt_abmil_atec23_tpu.engine.evaluate import roc_curve_points

    y = (rng.uniform(size=200) > 0.6).astype(np.int32)
    s = np.clip(y * 0.3 + rng.normal(0, 0.35, 200), 0, 1)
    s = np.round(s, 2)  # force tied scores
    fpr, tpr = roc_curve_points(y, s)
    sk_fpr, sk_tpr, _ = sk_roc(y, s, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)
    assert abs(np.trapezoid(tpr, fpr) - sk_auc(sk_fpr, sk_tpr)) < 1e-12


def test_plot_roc_curves(tmp_path, rng):
    """--plot_roc writes a per-repeat pooled ROC figure."""
    import pandas as pd
    from hipt_abmil_atec23_tpu.engine.evaluate import plot_roc_curves

    for rep in range(2):
        d = tmp_path / f"rep{rep}"
        d.mkdir()
        for k in range(2):
            y = (rng.uniform(size=30) > 0.5).astype(np.int32)
            p1 = np.clip(y * 0.4 + rng.uniform(0, 0.6, 30), 0, 1)
            pd.DataFrame({"slide_id": [f"s{i}" for i in range(30)],
                          "Y": y, "p_0": 1 - p1, "p_1": p1}
                         ).to_csv(d / f"fold_{k}.csv", index=False)
    out = plot_roc_curves([str(tmp_path / "rep0"), str(tmp_path / "rep1")],
                          [0, 1], str(tmp_path / "roc.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000
