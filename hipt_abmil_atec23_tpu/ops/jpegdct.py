"""On-device JPEG dequantization + IDCT: decode from sparse quantized
DCT coefficients shipped by the host, instead of decoded pixel planes.

The e2e encode pipeline is bound by the host->device wire (CLAUDE.md link
model). The raw-YCbCr path (ops/yuv.py) already halves RGB's bytes to
1.5 B/px; this path goes below the *pixel* floor by shipping what the JPEG
codec actually stores — quantized DCT coefficients, which are mostly zero —
in a sparse pack (~0.4 B/px measured at libjpeg quality 80 on the iid-noise
worst case; real tissue is smoother and packs tighter). The split of labor
is TPU-native:

  host   (native ws_read_regions_dct2): Huffman/entropy decode ONLY — the
         irreducibly serial part of JPEG — plus the sparse pack; the IDCT,
         chroma upsample and color conversion the host used to run are
         dropped from the 1-CPU budget entirely;
  device (this module): bitmap-unpack -> dequantize -> batched 8x8 IDCT
         (two small matmuls per block, MXU work) -> planes; then the
         existing ops/yuv.py fancy-upsample + JFIF conversion.

Pack format v3 (per region, per component; produced by native
ws_read_regions_dct2; block grid row-major, coefficients natural order):
  dc8  int8[bh, bw]       DC deltas: block (r, c>0) vs (r, c-1), row starts
                          (r, 0) vs (r-1, 0), block (0, 0) vs 0; deltas
                          outside int8 leave 0 here and ride `desc`;
  bmc  uint8[ceil(bl/2)]  per-block bitmap PREFIX LENGTHS as 4-bit
                          nibbles (low first): how many of the block's 8
                          bitmap bytes ship (byte i = the block's
                          vertical frequency i; tissue rarely excites
                          high rows, so trailing zero bytes are dropped
                          — ~2.5-4 B/block vs v2.1's fixed 8, which was
                          ~1/3 of the total wire);
  bmb  uint8[ngroups*capbm]  AC nonzero bitmap prefix bytes, GROUP-
                          PADDED like valn: LSB-first bit j of shipped
                          byte i marks coefficient i*8+j (bit 0, the DC,
                          is 0);
  valn uint8[ngroups*capg/2]  AC values in bitmap order as two's-complement
                          NIBBLES, low nibble first, GROUP-PADDED: each run
                          of _G=16 raster-consecutive blocks owns a fixed
                          window of capg slots (unused tail slots stay 0).
                          [-7, 7] inline; -8 marks "true value in esc8";
  esc8 int8[ngroups*capge]  AC-escape values (|v| > 7) in bitmap order
                          among the group's escape slots, GROUP-PADDED
                          like valn (~1 B/escape vs 6 for an explicit-
                          index stream — edge-dense tissue carries ~1
                          escape/block); -128 = "true value in aesc";
  aesc (idx int32, val int16)[cap_a]  |v| > 127 escapes keyed by
                          COEFFICIENT index (block*64 + k; idx = -1 pads
                          unused slots) — int16 so sharp-edged tissue
                          never forces the pixel fallback;
  desc (idx int32, val int16)[cap_d]  DC-delta escapes keyed by BLOCK
                          index (idx = -1 pads unused slots).

The group padding is what makes the unpack MXU work instead of gather
work: each value's slot comes from a bitmap popcount prefix (an in-group
cumsum — no stream-length scan at all), and all three stream expansions
(bitmap prefix bytes, AC escapes, AC values) ride ONE factorized one-hot
primitive (``_expand``): slot = q*R + r, an [Q, R] x [R, J] batched GEMM
over the r factor plus a Q-term masked reduce — J*(R+Q) on-the-fly
compare work per group instead of the naive contraction's J*S. Measured
lineage on a 4096px tissue region (full pack -> RGB, honest chained
timing — loop-carried integer inputs so nothing hoists): v1 full-stream
cumsum + gather 372 ms (VERDICT r3 item 3), v2/v3 naive one-hot matmul
52 ms, v3 + factorized _expand 39 ms (r5; unpack-Y 36 -> 24). The
remaining cost is the generated one-hot operands' HBM round-trips, which
the Pallas tile kernel (_unpack_kernel, TPU path) eliminates by keeping
every expansion operand in VMEM. The nibble/delta/escape coding cut wire
bytes roughly in half (VERDICT r3 item 1). |v| > 127 escape streams
scatter by explicit index (`.at[idx].set(val, mode='drop')`) after the
expansion, which keeps the expansion operands in the bf16-exact range.

The block-grid shapes carry the region geometry, so callers never pass
static height/width — a jit entry retraces naturally per region size.

Numerics: float IDCT vs libjpeg's jpeg_idct_islow integer IDCT differs by
at most 1 LSB on reconstructed samples (measured mean ~0.02); planes round
to uint8 exactly where libjpeg produces uint8 samples, so everything
downstream of the planes is identical to the raw-YCbCr path.

Replaces (with the YUV path) the host-side decode the reference does in
its DataLoader workers (reference: datasets/dataset_h5.py:146-165,
extract_features_fp.py:144-153).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from hipt_abmil_atec23_tpu.ops.yuv import yuv420_to_rgb

# 8-point IDCT basis with the JPEG normalization: sample block
# s = M^T F M (+128 level shift), M[u, x] = c(u) cos((2x+1)u pi / 16).
_M8 = (np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None]
              * np.pi / 16)
       * np.concatenate([[np.sqrt(1 / 8)], np.full(7, 0.5)])[:, None]
       ).astype(np.float32)


# Blocks per padded value group — mirrors native kDctGroup (exported as
# ws_dct_group_size; test_dct_path asserts the two agree).
_G = 16

# Test overrides for the unpack implementation dispatch: _FORCE_KERNEL
# True/False pins the Pallas/XLA path regardless of backend;
# _KERNEL_INTERPRET runs the kernel in Pallas interpreter mode (CPU
# parity tests against the XLA path — hardware parity is asserted by the
# bench-side profile scripts on the real chip).
_FORCE_KERNEL = None
_KERNEL_INTERPRET = False

# Groups per kernel tile: large enough that the grid-step overhead
# amortizes (a 4096px Y plane is 16384 groups), small enough that the
# in-VMEM one-hot/t arrays fit comfortably under the 100MB limit.
_KERNEL_TG = 32


def _kcumsum(x):
    """Inclusive prefix sum along the last (lane) axis via log2 shifted
    adds — Mosaic-lowerable (no reduce_window)."""
    n = x.shape[-1]
    sh = 1
    while sh < n:
        x = x + jnp.concatenate(
            [jnp.zeros_like(x[..., :sh]), x[..., :-sh]], axis=-1)
        sh *= 2
    return x


def _kexpand(marks, slot, v3):
    """In-VMEM stream expansion (the kernel twin of _expand, operating on
    one [tg, ...] tile): place the stream's k-th value at the k-th marked
    position. marks/slot [tg, J]; v3 [tg, Q, R] is the stream PRE-SHAPED
    by the XLA caller (Mosaic cannot reshape across the lane dim) with
    bf16-exact values (|v| <= 255); returns [tg, J] f32. Same
    slot = q*R + r factorization as _expand — the r-contraction is a
    batched [Q, R] x [R, J] MXU dot whose operands never leave VMEM (the
    XLA version's HBM round-trips were the measured bottleneck)."""
    tg, J = marks.shape
    Q, R = v3.shape[1], v3.shape[2]
    sq = slot // R
    sr = slot - sq * R
    ir = jax.lax.broadcasted_iota(jnp.int32, (tg, R, J), 1)
    ohr = ((sr[:, None, :] == ir) & marks[:, None, :]).astype(jnp.bfloat16)
    t = jax.lax.dot_general(v3.astype(jnp.bfloat16), ohr,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [tg,Q,J]
    iq = jax.lax.broadcasted_iota(jnp.int32, (tg, Q, J), 1)
    ohq = (sq[:, None, :] == iq) & marks[:, None, :]
    return jnp.sum(jnp.where(ohq, t, 0.0), axis=1)


def _kexpand_factor(s: int) -> int:
    """R for _kexpand: the divisor of S nearest 16. Compare work scales
    as J*(R + S/R) (optimum ~sqrt(S)), but measured on-chip R=16 beats
    the sqrt choice at every production cap — the v3 operand keeps
    16-wide lanes and the dot K-dim stays MXU-reasonable (R=8 byte
    expansion 3.3 ms/region vs 2.9 at R=16, value expansion flat)."""
    best = 1
    for r in range(1, s + 1):
        if s % r == 0 and abs(r - 16) < abs(best - 16):
            best = r
    return best


def _unpack_kernel(bcnt_ref, bmb3_ref, vals3_ref, esc3_ref, qrep_ref,
                   out_ref):
    """One tile (tg groups) of the v3 unpack, fully VMEM-resident and
    LANE-RESIDENT: every array keeps a fixed lane extent (Mosaic cannot
    reshape across lanes), per-block scalars broadcast to the J = G*64
    coefficient lanes via a constant 0/1 matrix dot, and prefix sums run
    as log2 concat-shifted adds. Pipeline: bitmap-prefix bytes -> bits ->
    nibble values -> escape merge (AFTER expansion: the e-th escape byte
    lands on the e-th -8 sentinel in j-order — slot is monotone, so
    j-order == stream order) -> dequantized AC coefficients [tg, G*64]
    f32. The DC column stays 0 (bitmap bit 0 is never set); the caller
    chains DC outside."""
    tg, G = bcnt_ref.shape
    J = G * 64
    lane = jax.lax.broadcasted_iota(jnp.int32, (tg, J), 1)
    # constant block-broadcast: per-block [tg, G] -> per-lane [tg, J]
    gj = jax.lax.broadcasted_iota(jnp.int32, (G, J), 1) // 64
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, J), 0)
    b64 = (gj == gi).astype(jnp.bfloat16)
    tolanes = lambda a: jnp.dot(a.astype(jnp.bfloat16), b64,
                                preferred_element_type=jnp.float32
                                ).astype(jnp.int32)
    bcnt = bcnt_ref[...]
    bc_j = tolanes(bcnt)                     # block's shipped-byte count
    goff_j = tolanes(_kcumsum(bcnt) - bcnt)  # block's byte-stream offset
    k64 = lane & 63
    ibyte = k64 >> 3                         # bitmap byte of this coeff
    bytemark = ibyte < bc_j
    bytes_j = _kexpand(bytemark, goff_j + ibyte, bmb3_ref[...])
    bits = ((bytes_j.astype(jnp.int32) >> (lane & 7)) & 1) > 0  # LSB-first
    slot = _kcumsum(jnp.where(bits, 1, 0)) - 1
    nib = _kexpand(bits, slot, vals3_ref[...])
    em = bits & (nib == -8.0)                # -8 nibbles mark escapes
    eslot = _kcumsum(jnp.where(em, 1, 0)) - 1
    esc = _kexpand(em, eslot, esc3_ref[...])
    out_ref[...] = jnp.where(em, esc, nib) * qrep_ref[...]


def _unpack_pallas(bcnt, bmb3, vals3, esc3, qrep, *, interpret=False):
    """Grid the VMEM-resident unpack over group tiles. bcnt [NG, G]
    int32; bmb3/vals3/esc3 [NG, Q, R] f32 streams pre-shaped at their
    _kexpand_factor (NG = n * ng, zero-padded to the tile multiple by the
    caller); qrep [1, G*64] f32 is the quant table tiled per block.
    Returns dequantized AC coefficients [NG, G*64] f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NG, G = bcnt.shape
    J = G * 64
    TG = _KERNEL_TG
    assert NG % TG == 0
    blk2 = lambda s: pl.BlockSpec((TG, s), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    blk3 = lambda a: pl.BlockSpec((TG,) + a.shape[1:],
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _unpack_kernel,
        grid=(NG // TG,),
        in_specs=[blk2(G), blk3(bmb3), blk3(vals3), blk3(esc3),
                  pl.BlockSpec((1, J), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk2(J),
        out_shape=jax.ShapeDtypeStruct((NG, J), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bcnt, bmb3, vals3, esc3, qrep)


def _expand_factor(s: int) -> int:
    """Largest divisor of the stream capacity <= 64: the R (inner one-hot)
    extent of _expand's slot factorization."""
    for r in range(min(64, s), 0, -1):
        if s % r == 0:
            return r
    return 1


def _expand(marks, stream):
    """Scatter a group-packed stream to marked positions — the pack's
    inverse and the unpack's only expensive primitive. out[..., j] =
    stream[..., rank(j) - 1] where rank is the inclusive prefix count of
    ``marks`` along j; unmarked positions read 0.

    marks: [n, ng, J] bool; stream: [n, ng, S] (bf16-exact values,
    |v| <= 255). Returns [n, ng, J] f32.

    The naive one-hot contraction (round 4) generated its operand on the
    fly inside the dot, costing J*S compare/select VPU ops per group —
    the measured 29 of 36 ms/region of the Y unpack (r5 profile). Here
    the slot index factors as slot = q*R + r (R = _expand_factor(S),
    Q = S/R), so out[j] = sum_q oh_q[q, j] * (sum_r V[q, r] * oh_r[r, j]):
    the r-contraction is a REAL batched GEMM [Q, R] x [R, J] (MXU) whose
    T output is bf16-exact (exactly one term fires per (q, j), values
    <= 255 need 8 significand bits), and the q-stage is a Q-term masked
    reduce — J*(R + Q) on-the-fly ops instead of J*S (6-10x fewer at the
    production caps). J rides the LANE axis in every operand (iotas
    broadcast over new sublane axes), so the compares stay 128-wide."""
    n, ng, J = marks.shape
    S = stream.shape[-1]
    R = _expand_factor(S)
    Q = S // R
    rank = jnp.cumsum(marks.astype(jnp.int32), axis=-1)
    slot = rank - 1                                      # [n, ng, J]
    sq = slot // R
    sr = slot - sq * R
    ir = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R, 1), 2)
    oh_r = ((sr[:, :, None, :] == ir) & marks[:, :, None, :]
            ).astype(jnp.bfloat16)                       # [n, ng, R, J]
    v = stream.reshape(n, ng, Q, R).astype(jnp.bfloat16)
    t = jnp.einsum("ngqr,ngrj->ngqj", v, oh_r,
                   preferred_element_type=jnp.bfloat16)  # exact: 1 term
    iq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Q, 1), 2)
    oh_q = (sq[:, :, None, :] == iq) & marks[:, :, None, :]
    return jnp.sum(jnp.where(oh_q, t, 0).astype(jnp.float32), axis=2)


def _unpack_component(dc8, bmc, bmb, valn, esc8, aidx, aval, didx, dval, q):
    """One component's v3 pack -> dequantized coefficient blocks
    [n, bh*bw, 8, 8] f32 (see module docstring for the field layout).
    The AC-stream expansions run in the VMEM-resident Pallas kernel on
    TPU (all one-hot operands on-chip) and through the factorized XLA
    _expand path elsewhere; DC chaining and the rare |v| > 127 explicit
    scatters stay in XLA either way (geometry-sized, cheap)."""
    n, bh, bw = dc8.shape
    bl = bh * bw
    ng = -(-bl // _G)
    capg = valn.shape[-1] * 2 // ng
    capbm = bmb.shape[-1] // ng
    capge = esc8.shape[-1] // ng
    qf = q.astype(jnp.float32)
    qrep = jnp.tile(qf, _G)[None]                        # [1, G*64]
    # bitmap prefix lengths (4-bit nibbles) -> per-block byte counts;
    # blocks past bl (partial last group) read count 0 -> zero bytes
    clo = (bmc & 0xF).astype(jnp.int32)
    chi = (bmc >> 4).astype(jnp.int32)
    bcnt = jnp.stack([clo, chi], axis=-1).reshape(n, -1)
    bcnt = jnp.pad(bcnt, ((0, 0), (0, ng * _G - bcnt.shape[1])))[:, :ng * _G]
    bcnt = bcnt.reshape(n, ng, _G)
    # nibble stream -> int8 values in [-8, 7]; -8 marks an escape whose
    # true value rides the group-padded esc8 byte stream
    lo = (valn & 0xF).astype(jnp.int8)
    hi = (valn >> 4).astype(jnp.int8)
    nib = jnp.stack([lo, hi], axis=-1).reshape(n, -1)    # [n, ng*capg] int8
    vals = jnp.where(nib > 7, nib - jnp.int8(16), nib)   # sign-extend 4-bit
    vals = vals.reshape(n, ng, capg)

    use_kernel = (_FORCE_KERNEL if _FORCE_KERNEL is not None
                  else jax.default_backend() == "tpu")
    if use_kernel:
        NG, TG = n * ng, _KERNEL_TG
        pad = (-NG) % TG  # zero-pad rows: empty groups decode to zeros

        def pre(a, s):
            # flatten groups, pad to the tile multiple, pre-shape the
            # stream to [NGp, Q, R] for the in-kernel MXU dot (Mosaic
            # cannot reshape across the lane dim)
            r = _kexpand_factor(s)
            flat = jnp.pad(a.reshape(NG, s), ((0, pad), (0, 0)))
            return flat.reshape(NG + pad, s // r, r).astype(jnp.float32)

        coefq = _unpack_pallas(
            jnp.pad(bcnt.reshape(NG, _G), ((0, pad), (0, 0))),
            pre(bmb, capbm), pre(vals, capg), pre(esc8, capge), qrep,
            interpret=_KERNEL_INTERPRET)
        coefq = coefq[:NG].reshape(n, ng, _G * 64)
    else:
        # bitmap byte expansion: block g's shipped byte i (i < cnt[g])
        # lands at position g*8 + i
        bidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 8), 3)
        bmarks = (bidx < bcnt[..., None]).reshape(n, ng, _G * 8)
        bmby = _expand(bmarks, bmb.reshape(n, ng, capbm))
        bm8 = bmby.astype(jnp.int32).reshape(n, ng * _G, 8)
        bits = ((bm8[..., None] >> jnp.arange(8, dtype=jnp.int32)) & 1
                ).reshape(n, ng, _G * 64)
        # escape bytes land on the slots holding the group's -8 markers
        # (padded tail slots hold 0, never -8)
        em = vals == -8
        esc = _expand(em, esc8.reshape(n, ng, capge))
        # value placement: expand the merged (nibble | escape) stream onto
        # the nonzero-coefficient positions; bf16-exact (|v| <= 128)
        vg = jnp.where(em, esc, vals.astype(jnp.float32))
        coefq = _expand(bits > 0, vg) * qrep
    coef = coefq.reshape(n, ng * _G, 64)[:, :bl]
    # pad slots carry idx = -1, which JAX indexing would WRAP to the last
    # element — push pads out of bounds so mode='drop' discards them
    big = jnp.int32(2**30)
    # |v| > 127 escapes (int16 — any libjpeg JCOEF) overwrite their -128
    # sentinels by coefficient index, pre-dequantized (replacement, so
    # dequant-before or -after is identical); int16 -> f32 is exact and
    # val*q < 2^31 rounds the same way the old post-multiply did
    qk = qf[jnp.where(aidx < 0, 0, aidx % 64)]
    coef = jax.vmap(lambda c, i, e: c.at[i].set(e, mode="drop"))(
        coef.reshape(n, bl * 64), jnp.where(aidx < 0, big, aidx),
        aval.astype(jnp.float32) * qk).reshape(n, bl, 64)
    # DC: scatter escape deltas, chain row starts down column 0, then
    # prefix-sum each row (bw-length scans — geometry-sized, not stream)
    d32 = dc8.astype(jnp.int32).reshape(n, bl)
    d32 = jax.vmap(lambda d, i, e: d.at[i].set(e, mode="drop"))(
        d32, jnp.where(didx < 0, big, didx), dval.astype(jnp.int32))
    d32 = d32.reshape(n, bh, bw)
    col0 = jnp.cumsum(d32[:, :, 0], axis=1)
    dc = jnp.cumsum(d32.at[:, :, 0].set(col0), axis=2)
    coef = coef.at[..., 0].set(dc.reshape(n, bl).astype(jnp.float32)
                               * qf[0])
    return coef.reshape(n, bl, 8, 8)


def _idct_plane(coef, bh, bw):
    """Coefficient blocks [n, bh*bw, 8, 8] -> uint8 sample plane
    [n, bh*8, bw*8] (libjpeg islow parity within 1 LSB)."""
    m = jnp.asarray(_M8)
    f = jnp.einsum("uy,nbuv,vx->nbyx", m, coef, m,
                   preferred_element_type=jnp.float32) + 128.0
    n = coef.shape[0]
    plane = f.reshape(n, bh, bw, 8, 8).transpose(0, 1, 3, 2, 4)
    plane = plane.reshape(n, bh * 8, bw * 8)
    return jnp.clip(jnp.round(plane), 0.0, 255.0).astype(jnp.uint8)


def _crop_planes(plane, off, out_h, out_w, denom):
    """Per-region crop of a decoded plane [n, H, W] to [n, out_h, out_w]
    at (off / denom) — the misaligned-grid mode: the host reads at the
    16-aligned origin (JPEG 4:2:0 MCUs are 16x16) plus one extra MCU
    row/column, and the device shifts. Cropping BEFORE the chroma
    upsample keeps plane-level libjpeg parity: the cropped samples are
    exactly the ones a direct decode of the region would produce."""
    def one(p, o):
        return jax.lax.dynamic_slice(
            p, (o[1] // denom, o[0] // denom), (out_h, out_w))
    return jax.vmap(one)(plane, off)


def dct_regions_to_planes(y_dc8, y_bmc, y_bmb, y_valn, y_esc8, y_aidx,
                          y_aval, y_didx, y_dval, cb_dc8, cb_bmc, cb_bmb,
                          cb_valn, cb_esc8, cb_aidx, cb_aval, cb_didx,
                          cb_dval, cr_dc8, cr_bmc, cr_bmb, cr_valn, cr_esc8,
                          cr_aidx, cr_aval, cr_didx, cr_dval, qt, valid,
                          off=None):
    """Sparse v3 coefficient pack -> uint8 YCbCr planes (Y [n, h, w],
    Cb/Cr [n, h/2, w/2]); white past the per-region valid extents.

    qt: [3, 64] quantization tables (natural order); valid: [n, 2] int32
    (valid_w, valid_h) — pixels at or past the extent render white
    (Y=255, Cb=Cr=128), matching the RGB/YUV readers' background fill
    beyond the slide edge. Region geometry comes from the block grids:
    h = 8 * y_dc8.shape[1], w = 8 * y_dc8.shape[2].

    off: per-region (dx, dy) luma crop offsets, EVEN, in [0, 16).
    Shape-encoded mode flag: [n, 2] means the host packed the region at
    its 16-aligned origin with one extra MCU row/column (tile grids off
    the MCU lattice — the common TCGA case) and the planes crop by 16 px
    here, before the white mask; [n, 0] or None means the grid was
    aligned and the pack is exact.
    """
    ybh, ybw = y_dc8.shape[1], y_dc8.shape[2]
    cbh, cbw = cb_dc8.shape[1], cb_dc8.shape[2]
    h, w = ybh * 8, ybw * 8
    y = _idct_plane(_unpack_component(y_dc8, y_bmc, y_bmb, y_valn, y_esc8,
                                      y_aidx, y_aval, y_didx, y_dval,
                                      qt[0]), ybh, ybw)
    cb = _idct_plane(_unpack_component(cb_dc8, cb_bmc, cb_bmb, cb_valn,
                                       cb_esc8, cb_aidx, cb_aval, cb_didx,
                                       cb_dval, qt[1]), cbh, cbw)
    cr = _idct_plane(_unpack_component(cr_dc8, cr_bmc, cr_bmb, cr_valn,
                                       cr_esc8, cr_aidx, cr_aval, cr_didx,
                                       cr_dval, qt[2]), cbh, cbw)
    if off is not None and off.shape[-1] == 2:  # static at trace time
        h, w = h - 16, w - 16
        y = _crop_planes(y, off, h, w, 1)
        cb = _crop_planes(cb, off, h // 2, w // 2, 2)
        cr = _crop_planes(cr, off, h // 2, w // 2, 2)
    vw = valid[:, 0][:, None, None]
    vh = valid[:, 1][:, None, None]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    y = jnp.where((col < vw) & (row < vh), y, jnp.uint8(255))
    # chroma is written per 2x2 unit whose top-left pixel is in-slide
    ccol = jax.lax.broadcasted_iota(jnp.int32, (1, h // 2, w // 2), 2)
    crow = jax.lax.broadcasted_iota(jnp.int32, (1, h // 2, w // 2), 1)
    cvalid = (ccol < (vw + 1) // 2) & (crow < (vh + 1) // 2)
    cb = jnp.where(cvalid, cb, jnp.uint8(128))
    cr = jnp.where(cvalid, cr, jnp.uint8(128))
    return y, cb, cr


def dct_regions_to_rgb(*pack):
    """Sparse v3 coefficient pack -> float32 RGB [n, h, w, 3] in 0..255,
    byte-identical to yuv420_to_rgb over host-decoded planes (the planes
    themselves match libjpeg within 1 LSB)."""
    y, cb, cr = dct_regions_to_planes(*pack)
    return yuv420_to_rgb(y, cb, cr)
