"""Fused transformer MLP (fc1 -> exact GELU -> fc2) as one Pallas kernel.

The ViT MLP is the second elementwise hot spot after attention softmax
(CLAUDE.md measured facts): XLA materializes the [rows, 4D] hidden
activation in HBM between fc1, the erf GELU, and fc2 — ~800MB of round-trip
traffic per ViT-256 block at batch 512. This kernel keeps both weight
matrices VMEM-resident (384x1536 x2 in bf16 = 2.4MB), streams the token
rows in tiles, and applies the exact-erf GELU in-register between the two
MXU passes, so HBM sees only x in and out out.

Semantics match the reference's torch nn.GELU (exact erf —
HIPT_4K/vision_transformer.py Mlp) to f32 accuracy; validated against
flax nn.gelu(approximate=False) in tests.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7 — f32-rounding
    level); Mosaic TPU has no erf primitive but exp lowers fine."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # torch nn.GELU default: x * 0.5 * (1 + erf(x / sqrt(2)))
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, with_ln: bool, residual: bool, eps: float):
    x = x_ref[...].astype(jnp.float32)                       # [T, D]
    if with_ln:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + eps) * g_ref[...] + be_ref[...]
    else:
        xn = x
    h = jnp.dot(xn, w1_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = _gelu_exact(h)                                       # in-register
    o = jnp.dot(h, w2_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2_ref[...]
    if residual:
        o = o + x
    o_ref[...] = o.astype(o_ref.dtype)


def _run(x, g, be, w1, b1, w2, b2, tile, with_ln, residual, eps):
    shape = x.shape
    d = shape[-1]
    h_dim = w1.shape[1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    rows_pad = ((rows + tile - 1) // tile) * tile
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))

    rep = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, with_ln=with_ln, residual=residual,
                          eps=eps),
        grid=(rows_pad // tile,),
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [rep()] * 6,
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_pad * d * h_dim,
            bytes_accessed=2 * rows_pad * d * x.dtype.itemsize,
            transcendentals=rows_pad * h_dim),
    )(x2, g, be, w1, b1, w2, b2)
    return out[:rows].reshape(shape)


def fused_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array,
              w2: jax.Array, b2: jax.Array,
              tile: int = 512) -> jax.Array:
    """x: [..., D]; w1 [D, H], w2 [H, D]. Returns gelu(x@w1+b1)@w2+b2 with
    the [rows, H] hidden never leaving VMEM. Rows pad to a tile multiple."""
    d = x.shape[-1]
    dummy = jnp.zeros((d,), jnp.float32)
    return _run(x, dummy, dummy, w1, b1, w2, b2, tile,
                with_ln=False, residual=False, eps=0.0)


def fused_ln_mlp_residual(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                          w1: jax.Array, b1: jax.Array,
                          w2: jax.Array, b2: jax.Array,
                          eps: float = 1e-6, tile: int = 512) -> jax.Array:
    """The transformer block's whole second half in ONE kernel:
    ``x + MLP(LayerNorm(x))`` — pre-norm, exact-erf GELU, residual add —
    with neither the normalized tokens nor the [rows, H] hidden touching
    HBM. Matches flax LayerNorm + the Dense MLP path to f32 accuracy."""
    return _run(x, gamma.astype(jnp.float32), beta.astype(jnp.float32),
                w1, b1, w2, b2, tile, with_ln=True, residual=True, eps=eps)
