"""ONE Pallas kernel per transformer block: LN1 -> QKV -> attention ->
proj(+residual) -> LN2 -> MLP(+residual), no HBM intermediates.

The reference executes a ViT block as ~15 separate torch ops with every
intermediate round-tripping HBM (reference: HIPT_4K/vision_transformer.py:
107-152 Block/Attention/Mlp). At ViT-256 production shape (batch 512 x 257
tokens x 384 dim, bf16) the attention half's LN, qkv reshape/5-D transposes,
attention in/out and proj traffic total ~3GB of HBM per block — more time
than the GEMMs themselves (measured: qkv+proj GEMMs 39ms for all 12 blocks
vs ~205ms for the full attention half).

This kernel holds ONE group of images' tokens in VMEM and runs the whole
block on them:

  - heads never materialize: ONE [rows, D] x [D, 3D] qkv GEMM (full MXU
    lanes; r5 roofline measured it 6% faster than 18 narrow N=64 per-head
    dots, bit-identical), then per head h the kernel lane-slices q/k/v
    from the f32 product, does the softmax in registers, and accumulates
    (p @ v_h) @ W_proj[h] straight into the [rows, D] accumulator —
    concat(heads) @ W_proj == sum_h o_h @ W_proj_h, so the
    head-concat/transpose never exists;
  - both LayerNorms, the exact-erf GELU (A&S 7.1.26 — Mosaic has no erf)
    and both residual adds happen in-register between MXU calls;
  - tokens pad once to a sublane multiple OUTSIDE the per-block loop
    (models/vit.py) and padded key columns are masked with NEG_INF; padded
    query rows flow through harmlessly and are dropped at CLS readout.

Numerics: bf16 MXU operands with f32 accumulation everywhere
(preferred_element_type), f32 LayerNorm/softmax statistics — same policy as
the XLA path it replaces; parity-tested against the flax Block in
tests/test_fused_block.py.

Scope: a FORWARD/inference kernel (no custom VJP) — exactly what the
reference's frozen DINO encoders need (HIPT_4K/hipt_model_utils.py:55-56
sets requires_grad=False). To fine-tune the ViTs, build them with
use_fused_block=False and differentiate the XLA path; the parameter trees
are identical either way.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hipt_abmil_atec23_tpu.ops.fused_mlp import _gelu_exact

NEG_INF = -1e30


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _block_kernel(x_ref, ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, ln2g_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                  b2_ref, o_ref, *, heads: int, n_valid: int, eps: float):
    g, n_pad, d = x_ref.shape
    hd = d // heads
    rows = g * n_pad
    x = x_ref[...].astype(jnp.float32).reshape(rows, d)

    xn = _ln(x, ln1g_ref[...], ln1b_ref[...], eps).astype(jnp.bfloat16)
    scale = hd ** -0.5
    acc = jnp.zeros((rows, d), jnp.float32)
    kmask = None
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (g, n_pad, n_pad), 2)
        kmask = col < n_valid
    # ONE [rows, D] x [D, 3D] qkv GEMM (full MXU lanes), then per-head
    # lane slices of the f32 result: measured 6% faster than 18 narrow
    # N=64 per-head dots at the production shape, bit-identical output
    # (r5 roofline sweep). Column order is (3, H, hd) — torch layout.
    qkv = jnp.dot(xn, wqkv_ref[...],
                  preferred_element_type=jnp.float32) + bqkv_ref[...]
    for h in range(heads):  # static unroll; heads never concat
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, (heads + h) * hd:(heads + h + 1) * hd]
        v = qkv[:, (2 * heads + h) * hd:(2 * heads + h + 1) * hd]
        q3 = (q * scale).astype(jnp.bfloat16).reshape(g, n_pad, hd)
        k3 = k.astype(jnp.bfloat16).reshape(g, n_pad, hd)
        s = jax.lax.dot_general(q3, k3, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if kmask is not None:
            s = jnp.where(kmask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        v3 = v.astype(jnp.bfloat16).reshape(g, n_pad, hd)
        o = jax.lax.dot_general(p, v3, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(o.reshape(rows, hd).astype(jnp.bfloat16),
                            wproj_ref[h],
                            preferred_element_type=jnp.float32)

    x2 = x + acc + bproj_ref[...]
    xn2 = _ln(x2, ln2g_ref[...], ln2b_ref[...], eps).astype(jnp.bfloat16)
    h1 = jnp.dot(xn2, w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[...]
    h1 = _gelu_exact(h1).astype(jnp.bfloat16)
    out = x2 + jnp.dot(h1, w2_ref[...],
                       preferred_element_type=jnp.float32) + b2_ref[...]
    o_ref[...] = out.reshape(g, n_pad, d).astype(o_ref.dtype)


def fused_vit_block(
    x: jax.Array,              # [B, N_pad, D] (pad tokens OUTSIDE the loop)
    ln1_g, ln1_b,
    wqkv, bqkv,                # [D, 3D], [3D]
    wproj, bproj,              # [D, D], [D]
    ln2_g, ln2_b,
    w1, b1, w2, b2,            # MLP [D, H], [H], [H, D], [D]
    *,
    num_heads: int,
    n_valid: Optional[int] = None,
    eps: float = 1e-6,
    group: int = 2,
) -> jax.Array:
    """Whole pre-norm transformer block as one kernel launch. Requires
    N_pad % 8 == 0 (pad once per network, not per block) and B % group == 0
    (caller pads the batch or picks a dividing group)."""
    b, n_pad, d = x.shape
    hd = d // num_heads
    n_valid = n_valid if n_valid is not None else n_pad
    assert n_pad % 8 == 0 and b % group == 0 and d % num_heads == 0

    cdt = jnp.bfloat16
    # qkv stays [D, 3D] for the single fused GEMM (column order 3, H, hd —
    # per-head lane slices of the f32 product are cheaper than 18 narrow
    # N=64 dots; r5 roofline); proj pre-splits per head so the [rows, hd]
    # head outputs accumulate straight into the [rows, D] residual
    bqkv_r = bqkv.astype(jnp.float32)
    wproj_r = wproj.reshape(num_heads, hd, d)

    f32 = lambda a: a.astype(jnp.float32)
    rep = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_attn = 2 * b * n_pad * d * (3 * d + d) + 4 * b * n_pad * n_pad * d
    flops_mlp = 4 * b * n_pad * d * w1.shape[1]
    out = pl.pallas_call(
        functools.partial(_block_kernel, heads=num_heads, n_valid=n_valid,
                          eps=eps),
        grid=(b // group,),
        in_specs=[pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [rep()] * 12,
        out_specs=pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_attn + flops_mlp,
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize,
            transcendentals=b * n_pad * (n_pad + w1.shape[1])),
    )(x, f32(ln1_g), f32(ln1_b), wqkv.astype(cdt), bqkv_r,
      wproj_r.astype(cdt), f32(bproj), f32(ln2_g), f32(ln2_b),
      w1.astype(cdt), f32(b1), w2.astype(cdt), f32(b2))
    return out
