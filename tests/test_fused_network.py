"""Parity tests for the whole-network fused kernel (ops/fused_network.py).

The stacked-weights network kernel must reproduce the chained per-block
kernel (ops/fused_block.py) exactly — identical per-block math, so the only
difference is where inter-block activations live (VMEM vs HBM round-trips).
CPU interpret mode runs the same kernel code Mosaic compiles on TPU.
"""
import functools
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

from hipt_abmil_atec23_tpu.ops.fused_block import fused_vit_block
from hipt_abmil_atec23_tpu.ops.fused_network import fused_vit_network


def _interpret(fn, *args, **kwargs):
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        return fn(*args, **kwargs)


def _stacked_weights(rng, depth, d, hidden):
    shapes = dict(ln1_g=(depth, d), ln1_b=(depth, d),
                  wqkv=(depth, d, 3 * d), bqkv=(depth, 3 * d),
                  wproj=(depth, d, d), bproj=(depth, d),
                  ln2_g=(depth, d), ln2_b=(depth, d),
                  w1=(depth, d, hidden), b1=(depth, hidden),
                  w2=(depth, hidden, d), b2=(depth, d))
    return {n: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
            for n, s in shapes.items()}


ORDER = ("ln1_g", "ln1_b", "wqkv", "bqkv", "wproj", "bproj",
         "ln2_g", "ln2_b", "w1", "b1", "w2", "b2")


@pytest.mark.parametrize("unroll", [False, True])
def test_network_matches_chained_blocks(rng, unroll):
    """Same numerics as T sequential fused_vit_block launches — bitwise in
    interpret mode (identical op sequence per block)."""
    T, D, H, HID = 3, 64, 4, 256
    B, NP, NV, G = 4, 16, 13, 2
    w = _stacked_weights(rng, T, D, HID)
    x = jnp.asarray(rng.normal(size=(B, NP, D)).astype(np.float32))

    want = x
    for t in range(T):
        want = _interpret(fused_vit_block, want,
                          *[w[n][t] for n in ORDER],
                          num_heads=H, n_valid=NV, group=G)
    got = _interpret(fused_vit_network, x, *[w[n] for n in ORDER],
                     num_heads=H, n_valid=NV, group=G, unroll=unroll)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_network_no_padding_no_mask(rng):
    """n_valid defaulting to n_pad must skip key masking entirely."""
    T, D, H, HID = 2, 32, 2, 64
    B, NP = 2, 8
    w = _stacked_weights(rng, T, D, HID)
    x = jnp.asarray(rng.normal(size=(B, NP, D)).astype(np.float32))
    want = x
    for t in range(T):
        want = _interpret(fused_vit_block, want,
                          *[w[n][t] for n in ORDER],
                          num_heads=H, group=1)
    got = _interpret(fused_vit_network, x, *[w[n] for n in ORDER],
                     num_heads=H, group=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
