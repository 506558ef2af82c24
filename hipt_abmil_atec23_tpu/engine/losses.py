"""Bag-level losses: CE, class-balanced CE, smooth top-1 SVM.

Capability parity with the reference's loss registry (reference:
main.py --bag_loss {ce,balanced_ce,svm}, utils/core_utils.py:141-154).

Divergence note (documented, intentional): the reference trains one slide per
step, and torch's weighted CrossEntropyLoss normalizes by the sum of sample
weights — so at batch size 1 the `balanced_ce` weighting cancels exactly and
is a numerical no-op in the reference. Our batched implementation applies the
weights across the batch (sum w_i * nll_i / sum w_i), which is what the flag
was meant to do.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def balanced_class_weights(class_counts: np.ndarray) -> np.ndarray:
    """w_c = (1/count_c) * (sum(counts)/n_classes)
    (reference: utils/core_utils.py:148)."""
    counts = np.asarray(class_counts, dtype=np.float64)
    return ((1.0 / np.maximum(counts, 1.0)) * (counts.sum() / len(counts))).astype(
        np.float32)


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  class_weights: Optional[jax.Array] = None) -> jax.Array:
    """Mean CE over the batch; optional per-class weights with torch's
    weighted-mean normalization (sum w*nll / sum w)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)


def smooth_top1_svm(logits: jax.Array, labels: jax.Array,
                    tau: float = 1.0, alpha: float = 1.0) -> jax.Array:
    """Smooth top-1 SVM loss (Berrada et al. 2018), the `svm` bag loss
    (reference: topk.svm.SmoothTop1SVM at utils/core_utils.py:142-146):
    L = tau * logsumexp((s_j + alpha*[j != y]) / tau) - s_y.
    """
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    aug = logits + alpha * (1.0 - onehot)
    lse = tau * jax.scipy.special.logsumexp(aug / tau, axis=-1)
    s_y = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(lse - s_y)


def make_per_sample_loss(name: str
                         ) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Per-slide validation loss, [B] vector (reference: validate() applies
    loss_fn per slide at batch size 1, core_utils.py:464,527). At batch 1 the
    balanced_ce class weighting cancels exactly (sum w*nll / sum w == nll),
    so ce and balanced_ce both reduce to plain NLL there; svm keeps its
    per-slide SmoothTop1SVM value."""
    if name in ("ce", "balanced_ce"):
        def nll(logits, labels):
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return nll
    if name == "svm":
        def svm(logits, labels, tau: float = 1.0, alpha: float = 1.0):
            onehot = jax.nn.one_hot(labels, logits.shape[-1],
                                    dtype=logits.dtype)
            aug = logits + alpha * (1.0 - onehot)
            lse = tau * jax.scipy.special.logsumexp(aug / tau, axis=-1)
            s_y = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
            return lse - s_y
        return svm
    raise ValueError(f"unknown bag loss {name!r}")


def make_bag_loss(name: str, class_counts: Optional[np.ndarray] = None
                  ) -> Callable[[jax.Array, jax.Array], jax.Array]:
    if name == "ce":
        return lambda logits, labels: cross_entropy(logits, labels)
    if name == "balanced_ce":
        if class_counts is None:
            raise ValueError("balanced_ce requires class_counts")
        w = jnp.asarray(balanced_class_weights(class_counts))
        return lambda logits, labels: cross_entropy(logits, labels, w)
    if name == "svm":
        return smooth_top1_svm
    raise ValueError(f"unknown bag loss {name!r}")
