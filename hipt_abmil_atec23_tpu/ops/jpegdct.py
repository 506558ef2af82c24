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
work: each value's slot comes from bitmap popcounts (64-length in-block
cumsum + a 16-length in-group cumsum — no stream-length scan at all), and
the values land in coefficient positions via a one-hot batched matmul
over the capg axis whose one-hot operand XLA fuses into the dot (never
materialized). Measured ~14x faster than the element-level
take_along_axis a tight stream forces (22 vs 312 ms/region on a 4096px
noise region) — v1's full-stream cumsum + gather was the round-3
bottleneck (VERDICT r3 item 3); the nibble/delta/escape coding also cut
wire bytes roughly in half (VERDICT r3 item 1). Escape streams scatter by
explicit index (`.at[idx].set(val, mode='drop')`) after the matmul, which
keeps the matmul operands in the bf16-exact [-8, 7] range.

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


def _unpack_component(dc8, bmc, bmb, valn, esc8, aidx, aval, didx, dval, q):
    """One component's v3 pack -> dequantized coefficient blocks
    [n, bh*bw, 8, 8] f32 (see module docstring for the field layout)."""
    n, bh, bw = dc8.shape
    bl = bh * bw
    ng = -(-bl // _G)
    capg = valn.shape[-1] * 2 // ng
    capbm = bmb.shape[-1] // ng
    # bitmap prefix lengths (4-bit nibbles) -> per-block byte counts;
    # blocks past bl (partial last group) read count 0 -> zero bytes
    clo = (bmc & 0xF).astype(jnp.int32)
    chi = (bmc >> 4).astype(jnp.int32)
    bcnt = jnp.stack([clo, chi], axis=-1).reshape(n, -1)
    bcnt = jnp.pad(bcnt, ((0, 0), (0, ng * _G - bcnt.shape[1])))[:, :ng * _G]
    bcnt = bcnt.reshape(n, ng, _G)
    # reconstruct the dense bitmap bytes by the same group-padded one-hot
    # matmul trick as the values: block j's byte i sits at group slot
    # starts[j] + i when i < cnt[j] (uint8 bytes are bf16-exact: <= 255
    # needs 8 significand bits, and exactly one one-hot term fires)
    bstart = jnp.cumsum(bcnt, axis=-1) - bcnt            # [n, ng, G]
    bidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 8), 3)
    bslot = bstart[..., None] + bidx                     # [n, ng, G, 8]
    bvalid = bidx < bcnt[..., None]
    biota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, capbm), 3)
    boh = ((bslot.reshape(n, ng, _G * 8)[..., None] == biota)
           & bvalid.reshape(n, ng, _G * 8)[..., None]).astype(jnp.bfloat16)
    bmby = jnp.einsum("ngjc,ngc->ngj", boh,
                      bmb.reshape(n, ng, capbm).astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    bm8 = bmby.astype(jnp.int32).reshape(n, ng * _G, 8)
    bits = ((bm8[..., None] >> jnp.arange(8, dtype=jnp.int32)) & 1
            ).reshape(n, ng * _G, 64)
    bits = bits.reshape(n, ng, _G, 64)
    rank = jnp.cumsum(bits.astype(jnp.int32), axis=-1)   # [n, ng, G, 64]
    cnt = rank[..., -1]                                  # [n, ng, G]
    starts = jnp.cumsum(cnt, axis=-1) - cnt              # in-group offsets
    slot = starts[..., None] + rank - 1                  # padded-stream slot
    # nibble stream -> int8 values in [-8, 7]; -8 marks an escape whose
    # true value rides the group-padded esc8 byte stream
    lo = (valn & 0xF).astype(jnp.int8)
    hi = (valn >> 4).astype(jnp.int8)
    nib = jnp.stack([lo, hi], axis=-1).reshape(n, -1)    # [n, ng*capg] int8
    vals = jnp.where(nib > 7, nib - jnp.int8(16), nib)   # sign-extend 4-bit
    # pad slots carry idx = -1, which JAX indexing would WRAP to the last
    # element — push pads out of bounds so mode='drop' discards them
    big = jnp.int32(2**30)
    # escape bytes align to their value slots by a second small one-hot
    # matmul: the e-th escape of a group lands on the slot holding the
    # group's e-th -8 marker (padded tail slots hold 0, never -8)
    em = (vals == -8).reshape(n, ng, capg)
    capge = esc8.shape[-1] // ng
    erank = jnp.cumsum(em.astype(jnp.int32), axis=-1) - 1
    eiota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, capge), 3)
    eoh = ((erank[..., None] == eiota) & em[..., None]).astype(jnp.bfloat16)
    esc = jnp.einsum("ngse,nge->ngs", eoh,
                     esc8.reshape(n, ng, capge).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    # value placement as a one-hot batched matmul over the capg axis: the
    # comparison-generated operand fuses into the dot (MXU), the inputs are
    # exact in bf16 (|v| <= 128 after the escape merge), and the f32
    # accumulation picks exactly one value per coefficient — bit-exact
    vg = jnp.where(em, esc,
                   vals.reshape(n, ng, capg).astype(jnp.float32)
                   ).astype(jnp.bfloat16)
    bitsg = (bits > 0).reshape(n, ng, _G * 64)
    slotg = slot.reshape(n, ng, _G * 64)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, capg), 3)
    onehot = ((slotg[..., None] == iota) & bitsg[..., None]
              ).astype(jnp.bfloat16)
    coef = jnp.einsum("ngjs,ngs->ngj", onehot, vg,
                      preferred_element_type=jnp.float32)
    coef = coef.reshape(n, ng * _G, 64)[:, :bl]
    # |v| > 127 escapes (int16 — any libjpeg JCOEF) overwrite their -128
    # sentinels by coefficient index, AFTER the matmul so its operands
    # stay bf16-exact; int16 -> f32 is exact
    coef = jax.vmap(lambda c, i, e: c.at[i].set(e, mode="drop"))(
        coef.reshape(n, bl * 64), jnp.where(aidx < 0, big, aidx),
        aval.astype(jnp.float32)).reshape(n, bl, 64)
    # DC: scatter escape deltas, chain row starts down column 0, then
    # prefix-sum each row (bw-length scans — geometry-sized, not stream)
    d32 = dc8.astype(jnp.int32).reshape(n, bl)
    d32 = jax.vmap(lambda d, i, e: d.at[i].set(e, mode="drop"))(
        d32, jnp.where(didx < 0, big, didx), dval.astype(jnp.int32))
    d32 = d32.reshape(n, bh, bw)
    col0 = jnp.cumsum(d32[:, :, 0], axis=1)
    dc = jnp.cumsum(d32.at[:, :, 0].set(col0), axis=2)
    coef = coef.at[..., 0].set(dc.reshape(n, bl).astype(jnp.float32))
    return (coef * q.astype(jnp.float32)).reshape(n, bl, 8, 8)


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
