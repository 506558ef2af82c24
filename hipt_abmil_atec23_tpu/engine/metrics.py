"""Classification metrics + vectorized bootstrap confidence intervals.

The reference computes AUC via sklearn per epoch (reference:
utils/core_utils.py:477-481, 550-563) and bootstraps final metrics with a
100,000-iteration *Python loop* (reference: bootstrapping.py:78-87). Here the
epoch metrics are small host-side computations (rank-based AUC, exact parity
with sklearn's roc_auc_score), and the bootstrap is a single vectorized
device computation: all resamples evaluated at once on TPU.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Host-side metrics (numpy)
# --------------------------------------------------------------------------

def binary_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """ROC AUC via the Mann-Whitney U statistic (tie-aware midranks);
    numerically identical to sklearn.roc_auc_score for binary labels."""
    labels = np.asarray(labels).astype(np.int32)
    scores = np.asarray(scores, dtype=np.float64)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = _midranks(scores)
    u = ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def _midranks(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return ranks


def multiclass_auc_ovr(labels: np.ndarray, probs: np.ndarray) -> float:
    """One-vs-rest macro AUC, NaN-skipping classes absent from labels
    (reference: utils/core_utils.py:553-563)."""
    n_classes = probs.shape[1]
    aucs = []
    for c in range(n_classes):
        if c in labels:
            aucs.append(binary_auc((labels == c).astype(int), probs[:, c]))
        else:
            aucs.append(float("nan"))
    return float(np.nanmean(aucs))


def auc_score(labels: np.ndarray, probs: np.ndarray, n_classes: int) -> float:
    if n_classes == 2:
        return binary_auc(labels, probs[:, 1])
    return multiclass_auc_ovr(labels, probs)


def accuracy(labels: np.ndarray, preds: np.ndarray) -> float:
    return float(np.mean(np.asarray(preds) == np.asarray(labels)))


def balanced_accuracy(labels: np.ndarray, preds: np.ndarray,
                      n_classes: int) -> float:
    recalls = []
    for c in range(n_classes):
        m = labels == c
        if m.any():
            recalls.append(float(np.mean(preds[m] == c)))
    return float(np.mean(recalls))


def f1_binary(labels: np.ndarray, preds: np.ndarray) -> float:
    tp = float(np.sum((preds == 1) & (labels == 1)))
    fp = float(np.sum((preds == 1) & (labels == 0)))
    fn = float(np.sum((preds == 0) & (labels == 1)))
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom > 0 else 0.0


def confusion_matrix(labels: np.ndarray, preds: np.ndarray,
                     n_classes: int) -> np.ndarray:
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    for t, p in zip(labels.astype(int), preds.astype(int)):
        cm[t, p] += 1
    return cm


class ClassAccuracyLogger:
    """Per-class count/correct accumulation (reference:
    Accuracy_Logger, utils/core_utils.py:17-50)."""

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.count = np.zeros(n_classes, np.int64)
        self.correct = np.zeros(n_classes, np.int64)

    def log_batch(self, y_hat: np.ndarray, y: np.ndarray,
                  valid: Optional[np.ndarray] = None) -> None:
        y_hat = np.asarray(y_hat).astype(int).ravel()
        y = np.asarray(y).astype(int).ravel()
        if valid is None:
            valid = np.ones_like(y, dtype=bool)
        valid = np.asarray(valid).astype(bool).ravel()
        for c in range(self.n_classes):
            m = (y == c) & valid
            self.count[c] += int(m.sum())
            self.correct[c] += int((y_hat[m] == c).sum())

    def summary(self, c: int):
        cnt = int(self.count[c])
        return (self.correct[c] / cnt if cnt else None,
                int(self.correct[c]), cnt)


# --------------------------------------------------------------------------
# Vectorized bootstrap (device-side)
# --------------------------------------------------------------------------

@dataclass
class BootstrapResult:
    auc: np.ndarray           # [B]
    f1: np.ndarray            # [B] (macro for multiclass)
    acc: np.ndarray           # [B]
    balanced_acc: np.ndarray  # [B]

    def summarize(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name in ("auc", "f1", "acc", "balanced_acc"):
            v = getattr(self, name)
            out[name] = {"mean": float(np.nanmean(v)),
                         "std": float(np.nanstd(v))}
        return out


def bootstrap_metrics(labels: np.ndarray, probs: np.ndarray,
                      n_bootstraps: int = 100_000, seed: int = 0,
                      batch: int = 10_000) -> BootstrapResult:
    """All-resample-at-once bootstrap of AUC/F1/acc/balanced-acc.

    Replaces the reference's per-iteration sklearn loop
    (reference: bootstrapping.py:78-87) with a rank-based formulation:
    resampled AUC is computed from a weighted Mann-Whitney statistic, where
    each bootstrap draw is a multinomial weight vector over samples — an
    einsum over [B, n] weights, no per-iteration host work.
    """
    labels = np.asarray(labels).astype(np.int32)
    probs = np.asarray(probs, dtype=np.float32)
    n = len(labels)
    n_classes = probs.shape[1]
    preds = np.argmax(probs, axis=1).astype(np.int32)

    key = jax.random.PRNGKey(seed)
    chunks = []
    done = 0
    while done < n_bootstraps:
        b = min(batch, n_bootstraps - done)
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (b, n), 0, n)
        chunks.append(_bootstrap_chunk(jnp.asarray(labels), jnp.asarray(probs),
                                       jnp.asarray(preds), idx, n_classes))
        done += b
    stacked = [np.concatenate([np.asarray(c[i]) for c in chunks])
               for i in range(4)]
    return BootstrapResult(*stacked)


from functools import partial


@partial(jax.jit, static_argnames=("n_classes",))
def _bootstrap_chunk(labels, probs, preds, idx, n_classes):
    lab = labels[idx]          # [B, n]
    prd = preds[idx]           # [B, n]

    # accuracy
    acc = jnp.mean((lab == prd).astype(jnp.float32), axis=1)

    # per-class recall / precision counts
    def class_counts(c):
        is_c = (lab == c)
        pred_c = (prd == c)
        tp = jnp.sum(is_c & pred_c, axis=1).astype(jnp.float32)
        fp = jnp.sum(~is_c & pred_c, axis=1).astype(jnp.float32)
        fn = jnp.sum(is_c & ~pred_c, axis=1).astype(jnp.float32)
        support = jnp.sum(is_c, axis=1).astype(jnp.float32)
        return tp, fp, fn, support

    tps, fps, fns, sups = jax.vmap(class_counts)(jnp.arange(n_classes))
    recall = tps / jnp.maximum(sups, 1.0)               # [C, B]
    has = sups > 0
    bal_acc = jnp.sum(jnp.where(has, recall, 0.0), axis=0) / jnp.maximum(
        jnp.sum(has.astype(jnp.float32), axis=0), 1.0)
    f1_c = 2 * tps / jnp.maximum(2 * tps + fps + fns, 1.0)  # [C, B]
    if n_classes == 2:
        f1 = f1_c[1]
        auc = _weighted_auc(labels, probs[:, 1], idx)
    else:
        f1 = jnp.mean(f1_c, axis=0)
        aucs = jnp.stack([
            _weighted_auc((labels == c).astype(jnp.int32), probs[:, c], idx)
            for c in range(n_classes)])                  # [C, B]
        auc = jnp.sum(jnp.where(has, aucs, 0.0), axis=0) / jnp.maximum(
            jnp.sum(has.astype(jnp.float32), axis=0), 1.0)
    return auc, f1, acc, bal_acc


def _weighted_auc(labels, scores, idx):
    """AUC of each bootstrap resample via multinomial weights.

    With w_i = multiplicity of sample i in the resample, AUC equals
    (sum_{i pos, j neg} w_i w_j [s_i > s_j] + 0.5 [s_i == s_j]) / (P * N),
    computed from sorted cumulative weights — O(B*n) after an O(n log n) sort.
    """
    n = labels.shape[0]
    b = idx.shape[0]
    w = jax.vmap(lambda row: jnp.bincount(row, length=n))(idx)  # [B, n] int
    w = w.astype(jnp.float32)

    order = jnp.argsort(scores, stable=True)
    s_sorted = scores[order]
    lab_sorted = labels[order]
    w_sorted = w[:, order]                          # [B, n]
    wp = w_sorted * (lab_sorted == 1)               # positive weights
    wn = w_sorted * (lab_sorted == 0)

    # group ties: cumulative neg weight strictly below each score
    cum_wn = jnp.cumsum(wn, axis=1)
    # for ties, find first index of each tie-group: neg weight strictly below
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]])
    group_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1  # [n]
    n_groups = n  # upper bound
    # neg weight below the start of this group
    grp_start_cum = jax.vmap(
        lambda cw: jnp.where(new_group, jnp.concatenate([jnp.zeros((1,)), cw[:-1]]),
                             0.0))(cum_wn)
    # propagate group-start value across the group via segment max
    below = jax.vmap(
        lambda gs: jax.ops.segment_max(gs, group_id, num_segments=n_groups)[group_id]
    )(grp_start_cum)                                 # [B, n]
    # neg weight tied with this score group
    grp_wn = jax.vmap(
        lambda wni: jax.ops.segment_sum(wni, group_id, num_segments=n_groups)[group_id]
    )(wn)
    u = jnp.sum(wp * (below + 0.5 * grp_wn), axis=1)
    p = jnp.sum(wp, axis=1)
    q = jnp.sum(wn, axis=1)
    return jnp.where((p > 0) & (q > 0), u / jnp.maximum(p * q, 1.0), jnp.nan)
