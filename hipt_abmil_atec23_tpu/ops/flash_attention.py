"""Pallas TPU attention kernels for the ViT hot path.

The reference materializes softmax(QK^T)V with full [B, H, N, N] attention
matrices in HBM (reference: HIPT_4K/vision_transformer.py:119-131,
vision_transformer4k.py:125-137). Both HIPT ViTs run tiny sequences
(257 tokens) over huge batches (256 tiles per 4096^2 region), so the right
kernel is a single-pass fused block: per (batch*head, q-block) program, keep
K/V resident in VMEM, compute scores -> masked softmax -> PV without ever
writing the attention matrix to HBM. For longer sequences (instance bags,
future full-slide attention) `flash_attention` tiles K/V with the standard
online-softmax recurrence and fp32 accumulators in VMEM scratch.

Both paths are numerically validated against the naive jnp reference in
tests (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attention_reference(q, k, v, valid_len: Optional[int] = None):
    """Naive jnp oracle: q,k,v [BH, N, D] -> [BH, N, D]."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if valid_len is not None:
        col = jnp.arange(s.shape[-1])[None, None, :]
        s = jnp.where(col < valid_len, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


# --------------------------------------------------------------------------
# single-pass kernel (K/V fully VMEM-resident) — the ViT path (N <= ~1024)
# --------------------------------------------------------------------------

def _fused_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    # one program handles a GROUP of (batch*head) entries as batched
    # dot_generals — amortizes the per-grid-step dispatch overhead that
    # dominates at tiny N (measured: 9ms vs 10.4ms for an inner fori of
    # 2-D dots, vs ~60ms for one-head-per-program grids). Queries may be
    # tiled ([G, BQ, D] with K/V full) — same code, K/V stay resident.
    # operands stay in their storage dtype — the MXU multiplies bf16 with
    # f32 accumulation natively (preferred_element_type), which matches the
    # XLA path's numerics and halves VMEM vs upcasting K/V copies
    q = q_ref[...]                                     # [G, BQ, D]
    k = k_ref[...]                                     # [G, N, D]
    v = v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if n_valid < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    valid_len: Optional[int] = None,
                    group: int = 8,
                    block_q: Optional[int] = None) -> jax.Array:
    """q,k,v: [BH, N, D]; returns [BH, N, D]. Single-pass: K/V stay VMEM-
    resident, the [N, N] attention matrix never touches HBM. `group` heads
    share one grid step (ViT-257 at batch 512 is 3072 tiny heads — per-step
    overhead, not compute, is the limiter). For medium N where [N, N]
    scores exceed VMEM, `block_q` tiles the query axis while K/V stay
    resident — no online-softmax recurrence needed until K/V themselves
    outgrow VMEM (~8k at D=64; use flash_attention beyond). N pads to a
    sublane multiple; `valid_len` masks padded keys (default: true N)."""
    bh, n, d = q.shape
    n_valid = valid_len if valid_len is not None else n
    bq = block_q or _round_up(n, 8)
    n_pad = _round_up(n, max(8, bq))
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    bh_pad = _round_up(bh, group)
    if bh_pad != bh:
        pad = [(0, bh_pad - bh), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    out = pl.pallas_call(
        functools.partial(_fused_attn_kernel, scale=d ** -0.5,
                          n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((bh_pad, n_pad, d), q.dtype),
        grid=(bh_pad // group, n_pad // bq),
        in_specs=[
            pl.BlockSpec((group, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * d,
            bytes_accessed=bh * n_pad * d * 3 * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad),
    )(q, k, v)
    return out[:bh, :n, :]


# --------------------------------------------------------------------------
# tiled flash attention (online softmax) — long sequences
# --------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale, n_valid, block_k):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)                   # [BQ, D]
    k = k_ref[0].astype(jnp.float32)                   # [BK, D]
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_ref[:]                                  # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    valid_len: Optional[int] = None,
                    block_q: int = 128, block_k: int = 256) -> jax.Array:
    """Tiled online-softmax attention; q,k,v [BH, N, D] -> [BH, N, D]."""
    bh, n, d = q.shape
    n_valid = valid_len if valid_len is not None else n
    n_pad = _round_up(n, max(block_q, block_k))
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=d ** -0.5, n_valid=n_valid,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        grid=(bh, n_pad // block_q, n_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * d,
            bytes_accessed=bh * n_pad * d * 3 * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad),
    )(q, k, v)
    return out[:, :n, :]


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              valid_len: Optional[int] = None,
              interpret_threshold: int = 1024) -> jax.Array:
    """Dispatch by sequence length (crossover measured on v5e, r3 —
    d=64 heads, equal total work per row):

      N=4096: q-tiled 5.2 ms vs XLA 11.2 (2.2x)   [bh=24, f32]
      N=8192: q-tiled 7.0 ms vs XLA 18.1 (2.6x)   [bh=12, f32]
      N=16384: q-tiled 10.3 ms vs XLA 31.0 (3.0x) [bh=6, f32]
      N=32768: q-tiled 16.3 ms; XLA cannot materialize the scores and the
               online-softmax flash path takes 73 ms                [bh=3]

    - short (full scores fit VMEM): grouped single-pass kernel;
    - medium (K/V fit VMEM): query-tiled single-pass — K and V stay
      resident per (batch*head) program while the query axis streams, so
      HBM sees 3*N*D reads total and there is no online-softmax
      recurrence. This wins over BOTH XLA and the flash path for every N
      where K/V fit (~24k f32 / ~49k bf16 at D=64);
    - long: tiled online-softmax flash (the only O(N)-memory option)."""
    n = q.shape[1]
    d = q.shape[2]
    if n <= interpret_threshold:
        # scale the head-group with n: the single-pass kernel's f32 score
        # block is group * n_pad^2 * 4 bytes — group=8 at n=1024 would be
        # ~33MB, past the ~16MB default VMEM budget (ADVICE r2 #1);
        # n=257 still gets the measured-best group of 8.
        n_pad = _round_up(n, 8)
        group = max(1, min(8, (8 * 1024 * 1024) // (4 * n_pad * n_pad)))
        return fused_attention(q, k, v, valid_len, group=group)
    if 2 * n * d * q.dtype.itemsize <= 12 * 1024 * 1024:
        # block_q from the score-block budget (bq * N * 4 bytes <= ~24MB
        # under the 64MB raised VMEM limit): 512 at 4-8k, 256 at 16k,
        # 128 at 32k — matches the measured-best points above
        bq = max(128, min(512, (24 * 1024 * 1024) // (4 * n) // 128 * 128))
        return fused_attention(q, k, v, valid_len, group=1, block_q=bq)
    return flash_attention(q, k, v, valid_len)
