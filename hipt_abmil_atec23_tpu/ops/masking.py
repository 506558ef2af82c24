"""Masked-bag primitives.

The reference processes one variable-length bag per optimizer step
(reference: utils/core_utils.py:300-442, one slide per DataLoader item).  XLA
wants static shapes, so this framework represents a bag as a fixed-size
[N, D] buffer plus a boolean validity mask and provides masked equivalents of
the reductions the reference performs with ragged tensors (softmax over
instances, top-k / bottom-k instance selection for CLAM's clustering loss,
reference: models/model_clam.py:116-145).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Large-but-finite sentinel: keeps softmax/top_k well-defined even for rows
# that are entirely padding (exp() underflows to a uniform distribution over
# padded slots whose weights are later multiplied by the mask anyway).
NEG_INF = -1e9


def masked_softmax(scores: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over `axis`, restricted to positions where ``mask`` is True.

    Padded positions receive exactly 0 probability. A fully-masked row returns
    all zeros (not NaN), so downstream weighted sums are zero vectors.
    """
    mask = jnp.asarray(mask, dtype=bool)
    neg = jnp.asarray(NEG_INF, dtype=scores.dtype)
    masked_scores = jnp.where(mask, scores, neg)
    # Stable softmax.
    m = jnp.max(masked_scores, axis=axis, keepdims=True)
    e = jnp.exp(masked_scores - m) * mask.astype(scores.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, jnp.finfo(scores.dtype).tiny)


def masked_top_k(scores: jax.Array, mask: jax.Array, k: int):
    """Indices & values of the k largest *valid* scores along the last axis.

    Mirrors ``torch.topk(A, k)`` on a ragged bag (reference:
    models/model_clam.py:120). If fewer than k valid entries exist the
    remaining slots point at padded entries; callers should weight by the
    returned validity.
    """
    mask = jnp.asarray(mask, dtype=bool)
    neg = jnp.asarray(NEG_INF, dtype=scores.dtype)
    masked_scores = jnp.where(mask, scores, neg)
    values, indices = jax.lax.top_k(masked_scores, k)
    valid = jnp.take_along_axis(mask, indices, axis=-1)
    return values, indices, valid


def masked_bottom_k(scores: jax.Array, mask: jax.Array, k: int):
    """Indices & values of the k smallest valid scores (reference's
    ``torch.topk(-A, k)``, models/model_clam.py:122)."""
    values, indices, valid = masked_top_k(-scores, mask, k)
    return -values, indices, valid


def pad_bag(features: np.ndarray, n_pad: int):
    """Host-side: pad an [n, D] bag to [n_pad, D]; returns (padded, mask).

    Used by the data pipeline to bucket ragged bags into static shapes.
    """
    n, d = features.shape
    if n > n_pad:
        raise ValueError(f"bag of size {n} does not fit padded size {n_pad}")
    out = np.zeros((n_pad, d), dtype=features.dtype)
    out[:n] = features
    mask = np.zeros((n_pad,), dtype=bool)
    mask[:n] = True
    return out, mask
