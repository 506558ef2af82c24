"""The ENTIRE ViT block stack as ONE Pallas kernel with resident weights.

ops/fused_block.py runs one transformer block per launch: per block, the
group's tokens round-trip HBM (in + out), so a 12-block ViT-256 forward at
batch 512 moves ~2.5 GB of activations that exist only to connect
consecutive launches. At the measured Pallas stream rate (~106 GB/s) that
inter-block DMA is the same order as the MXU time per grid step — the
per-block pipeline is balanced, not compute-bound.

This kernel keeps the WHOLE stack's weights resident in VMEM (vit_small:
42.5 MB bf16, well under the 100 MB budget) and loops the blocks in-kernel,
so a group of images' tokens enter HBM-side once and leave once; every
inter-block activation lives its whole life in VMEM/registers. Per-block
math is identical to ops/fused_block.py (per-head QKV from pre-split
weights, in-register softmax, proj accumulated per head, exact-erf GELU via
A&S 7.1.26, f32 LayerNorm/softmax statistics, bf16 MXU operands with f32
accumulation).

The weights arrive STACKED on a leading depth axis ([T, ...] per tensor) and
the block loop indexes that axis — either a lax.fori_loop with dynamic
leading-dim loads (small code, fast Mosaic compile) or a static Python
unroll (``unroll=True``). Feasibility (stacked weights + activation working
set vs VMEM) is decided by models/vit.py fused_network_group; infeasible
shapes (e.g. vit_base: 170 MB of weights) fall back to the per-block kernel.

Scope: forward/inference only, like fused_block — exactly what the frozen
DINO encoders need (reference: HIPT_4K/hipt_model_utils.py:55-56 freezes
them; blocks at HIPT_4K/vision_transformer.py:107-152).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hipt_abmil_atec23_tpu.ops.fused_block import _ln
from hipt_abmil_atec23_tpu.ops.fused_mlp import _gelu_exact

NEG_INF = -1e30


def _network_kernel(x_ref, ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                    wproj_ref, bproj_ref, ln2g_ref, ln2b_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, o_ref, *, depth: int,
                    heads: int, n_valid: int, eps: float, unroll: bool):
    g, n_pad, d = x_ref.shape
    hd = d // heads
    rows = g * n_pad
    scale = hd ** -0.5
    kmask = None
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (g, n_pad, n_pad), 2)
        kmask = col < n_valid

    def block(blk, x):
        # 1-D per-block params arrive as [T, 1, D]: the depth axis stays on
        # an untiled leading dim, so the dynamic `blk` lookup is a free
        # leading-dim slice (never a dynamic sublane index)
        xn = _ln(x, ln1g_ref[blk], ln1b_ref[blk], eps).astype(jnp.bfloat16)
        acc = jnp.zeros((rows, d), jnp.float32)
        for h in range(heads):  # heads never concat (see fused_block.py)
            q = jnp.dot(xn, wqkv_ref[blk, 0, h],
                        preferred_element_type=jnp.float32) \
                + bqkv_ref[blk, 0, h]
            k = jnp.dot(xn, wqkv_ref[blk, 1, h],
                        preferred_element_type=jnp.float32) \
                + bqkv_ref[blk, 1, h]
            v = jnp.dot(xn, wqkv_ref[blk, 2, h],
                        preferred_element_type=jnp.float32) \
                + bqkv_ref[blk, 2, h]
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
                                wproj_ref[blk, h],
                                preferred_element_type=jnp.float32)
        x2 = x + acc + bproj_ref[blk]
        xn2 = _ln(x2, ln2g_ref[blk], ln2b_ref[blk], eps).astype(jnp.bfloat16)
        h1 = jnp.dot(xn2, w1_ref[blk],
                     preferred_element_type=jnp.float32) + b1_ref[blk]
        h1 = _gelu_exact(h1).astype(jnp.bfloat16)
        return x2 + jnp.dot(h1, w2_ref[blk],
                            preferred_element_type=jnp.float32) + b2_ref[blk]

    x = x_ref[...].astype(jnp.float32).reshape(rows, d)
    if unroll:
        for blk in range(depth):
            x = block(blk, x)
    else:
        x = jax.lax.fori_loop(0, depth, block, x)
    o_ref[...] = x.reshape(g, n_pad, d).astype(o_ref.dtype)


def fused_vit_network(
    x: jax.Array,              # [B, N_pad, D] (padded once by the caller)
    ln1_g, ln1_b,              # [T, D] each
    wqkv, bqkv,                # [T, D, 3D], [T, 3D]
    wproj, bproj,              # [T, D, D], [T, D]
    ln2_g, ln2_b,              # [T, D]
    w1, b1, w2, b2,            # [T, D, H], [T, H], [T, H, D], [T, D]
    *,
    num_heads: int,
    n_valid: Optional[int] = None,
    eps: float = 1e-6,
    group: int = 2,
    unroll: bool = False,
) -> jax.Array:
    """All T pre-norm transformer blocks as ONE kernel launch with the
    stacked weights resident in VMEM. Same contract as fused_vit_block
    (N_pad % 8 == 0, B % group == 0, padded keys masked via n_valid), same
    numerics — callers dispatch via models/vit.py fused_network_group."""
    b, n_pad, d = x.shape
    depth = ln1_g.shape[0]
    hd = d // num_heads
    hidden = w1.shape[-1]
    n_valid = n_valid if n_valid is not None else n_pad
    assert n_pad % 8 == 0 and b % group == 0 and d % num_heads == 0

    cdt = jnp.bfloat16
    # head-split weight layout (free leading-dim lookups in the kernel)
    wqkv_r = wqkv.reshape(depth, d, 3, num_heads, hd).transpose(0, 2, 3, 1, 4)
    bqkv_r = bqkv.reshape(depth, 3, num_heads, hd).astype(jnp.float32)
    wproj_r = wproj.reshape(depth, num_heads, hd, d)

    # 1-D per-block params as [T, 1, F]: depth stays an untiled leading dim
    # (a [T, F] layout would put depth on sublanes — dynamic sublane slicing)
    vec = lambda a: a.astype(jnp.float32)[:, None, :]
    rep = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    wbytes = depth * (4 * d * d + 2 * d * hidden) * 2
    flops_attn = depth * (2 * b * n_pad * d * (3 * d + d)
                          + 4 * b * n_pad * n_pad * d)
    flops_mlp = depth * 4 * b * n_pad * d * hidden
    out = pl.pallas_call(
        functools.partial(_network_kernel, depth=depth, heads=num_heads,
                          n_valid=n_valid, eps=eps, unroll=unroll),
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
            bytes_accessed=2 * b * n_pad * d * x.dtype.itemsize + wbytes,
            transcendentals=depth * b * n_pad * (n_pad + hidden)),
    )(x, vec(ln1_g), vec(ln1_b), wqkv_r.astype(cdt), bqkv_r,
      wproj_r.astype(cdt), vec(bproj), vec(ln2_g), vec(ln2_b),
      w1.astype(cdt), vec(b1), w2.astype(cdt), vec(b2))
    return out
