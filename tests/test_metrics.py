"""Metrics: sklearn parity and bootstrap vectorization correctness."""
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
