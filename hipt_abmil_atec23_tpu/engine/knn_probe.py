"""Slide-level kNN probe over aggregated region features.

Capability parity with the reference's HIPT_knn.py: aggregate each slide's
region features into one vector (mean pooling — the reference uses the
pretrained HIPT global-pooling head when available, mean-256 otherwise) and
classify with the DINO-style weighted kNN classifier (temperature-scaled
cosine similarity voting; reference: HIPT_knn.py:40-79, T=1).

TPU redesign: the whole kNN — pairwise similarities, top-k, temperature
softmax vote — is one jitted computation over [n_test, n_train].
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def aggregate_slide_features(store, slide_ids, method: str = "mean",
                             lgp_params: Optional[Dict] = None) -> np.ndarray:
    """Per-slide embedding from the region-feature bag.

    ``method='hipt_lgp'`` is the reference's aggregation — the pretrained
    HIPT_LGP_FC global-pooling branch (reference: HIPT_knn.py:19-27) —
    via models/hipt_mil.py; pass ``lgp_params`` converted from the external
    checkpoint (or omit for the documented random-init fallback).
    ``'mean'``/``'max'`` are cheap checkpoint-free alternatives.
    """
    if method == "hipt_lgp":
        from hipt_abmil_atec23_tpu.models.hipt_mil import (
            hipt_lgp_aggregate_jit, init_hipt_lgp_params)
        if lgp_params is None:
            lgp_params = init_hipt_lgp_params(np.random.default_rng(0))
        return np.stack([
            np.asarray(hipt_lgp_aggregate_jit(
                lgp_params, jnp.asarray(store.load_features(sid))))
            for sid in slide_ids]).astype(np.float32)
    out = []
    for sid in slide_ids:
        feats = store.load_features(sid)
        if method == "mean":
            out.append(feats.mean(0))
        elif method == "max":
            out.append(feats.max(0))
        else:
            raise ValueError(method)
    return np.stack(out).astype(np.float32)


@partial(jax.jit, static_argnames=("k", "n_classes"))
def _knn_vote(train_x, train_y, test_x, k: int, n_classes: int,
              temperature: float):
    """DINO knn_classifier semantics: cosine similarity, top-k neighbors,
    exp(sim/T)-weighted one-hot vote."""
    tr = train_x / jnp.maximum(jnp.linalg.norm(train_x, axis=1,
                                               keepdims=True), 1e-8)
    te = test_x / jnp.maximum(jnp.linalg.norm(test_x, axis=1,
                                              keepdims=True), 1e-8)
    sim = te @ tr.T                                  # [n_test, n_train]
    topv, topi = jax.lax.top_k(sim, k)
    w = jnp.exp(topv / temperature)                  # [n_test, k]
    votes = jax.nn.one_hot(train_y[topi], n_classes)  # [n_test, k, C]
    scores = jnp.einsum("tk,tkc->tc", w, votes)
    return scores / jnp.maximum(scores.sum(-1, keepdims=True), 1e-8)


def knn_classify(train_x: np.ndarray, train_y: np.ndarray,
                 test_x: np.ndarray, *, k: int = 20, n_classes: int = 2,
                 temperature: float = 1.0) -> np.ndarray:
    """Returns [n_test, n_classes] class probabilities."""
    k = min(k, len(train_x))
    return np.asarray(_knn_vote(jnp.asarray(train_x),
                                jnp.asarray(train_y.astype(np.int32)),
                                jnp.asarray(test_x), k, n_classes,
                                temperature))


def knn_cv_probe(store, manifest, splits, *, k: int = 20,
                 temperature: float = 1.0, method: str = "mean",
                 lgp_params: Optional[Dict] = None) -> Dict[str, float]:
    """k-fold kNN probe (reference: HIPT_knn.py main loop). Returns mean
    AUC/acc across folds."""
    from hipt_abmil_atec23_tpu.engine import metrics as M
    ids = list(manifest.slide_ids)
    labels = manifest.labels
    feats = aggregate_slide_features(store, ids, method, lgp_params)
    aucs, accs = [], []
    for train_idx, _, test_idx in splits:
        probs = knn_classify(feats[train_idx], labels[train_idx],
                             feats[test_idx], k=k,
                             n_classes=manifest.n_classes,
                             temperature=temperature)
        aucs.append(M.auc_score(labels[test_idx], probs, manifest.n_classes))
        accs.append(M.accuracy(labels[test_idx], probs.argmax(1)))
    return {"auc_mean": float(np.mean(aucs)), "auc_std": float(np.std(aucs)),
            "acc_mean": float(np.mean(accs))}
