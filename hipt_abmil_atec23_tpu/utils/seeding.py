"""Deterministic seeding.

The reference seeds python/numpy/torch/cuda and forces cudnn determinism
(reference: main.py:398-410, re-seeded per fold at main.py:232). JAX programs
are pure given a PRNG key, so determinism here means: one root seed ->
per-fold / per-epoch numpy generators for host-side sampling, plus a root
jax.random key for init/dropout.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def fold_seed(root_seed: int, fold: int) -> int:
    """Stable per-fold seed (reference re-seeds with the same seed per fold;
    we derive distinct streams to avoid cross-fold correlation)."""
    return (root_seed * 1_000_003 + fold * 7919) % (2**31 - 1)


def host_rng(root_seed: int, *stream: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence((root_seed, *stream)))


def jax_key(root_seed: int, *stream: int) -> jax.Array:
    key = jax.random.PRNGKey(root_seed)
    for s in stream:
        key = jax.random.fold_in(key, s)
    return key
