"""On-device JPEG dequantization + IDCT: decode from sparse quantized
DCT coefficients shipped by the host, instead of decoded pixel planes.

The e2e encode pipeline is bound by the host->device wire (CLAUDE.md link
model). The raw-YCbCr path (ops/yuv.py) already halves RGB's bytes to
1.5 B/px; this path goes below the *pixel* floor by shipping what the JPEG
codec actually stores — quantized DCT coefficients, which are mostly zero —
in a sparse pack (~0.5-0.9 B/px measured at libjpeg quality 80; real TCGA
tissue is smoother and packs tighter). The split of labor is TPU-native:

  host   (native ws_read_regions_dct): Huffman/entropy decode ONLY — the
         irreducibly serial part of JPEG — plus the sparse pack; the IDCT,
         chroma upsample and color conversion the host used to run are
         dropped from the 1-CPU budget entirely;
  device (this module): bitmap-unpack -> dequantize -> batched 8x8 IDCT
         (two small matmuls per block, MXU work) -> planes; then the
         existing ops/yuv.py fancy-upsample + JFIF conversion.

Pack format (per region, per component; produced by native
ws_read_regions_dct; block grid row-major, coefficients natural order):
  dc  int16[bh, bw]      DC coefficients, dense (they escape int8 in flat
                         white areas, so they never ride the int8 stream);
  bm  uint8[bh, bw, 8]   AC nonzero bitmap: LSB-first bit j of byte i
                         marks coefficient i*8+j (bit 0, the DC, is 0);
  val int8[cap]          AC values in bitmap order (|AC| > 127 never
                         ships — the host flags the region for the pixel
                         fallback; measured 0 occurrences at quality 80).

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


def _unpack_component(dc, bm, val, q):
    """dc [n, bh, bw] int16 + bm [n, bh, bw, 8] uint8 + val [n, cap] int8 +
    q [64] -> dequantized coefficient blocks [n, bh*bw, 8, 8] f32."""
    n, bh, bw = dc.shape
    bl = bh * bw
    bits = (bm.reshape(n, bl, 8)[..., None]
            >> jnp.arange(8, dtype=jnp.uint8)) & 1
    flat = bits.reshape(n, bl * 64).astype(jnp.int32)
    # position of each set bit in the values stream (inclusive scan - 1)
    idx = jnp.cumsum(flat, axis=-1) - 1
    cap = val.shape[-1]
    picked = jnp.take_along_axis(
        val.astype(jnp.float32), jnp.clip(idx, 0, cap - 1), axis=-1)
    coef = jnp.where(flat > 0, picked, 0.0).reshape(n, bl, 64)
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


def dct_regions_to_planes(y_dc, y_bm, y_val, cb_dc, cb_bm, cb_val,
                          cr_dc, cr_bm, cr_val, qt, valid, off=None):
    """Sparse coefficient pack -> uint8 YCbCr planes (Y [n, h, w],
    Cb/Cr [n, h/2, w/2]); white past the per-region valid extents.

    qt: [3, 64] quantization tables (natural order); valid: [n, 2] int32
    (valid_w, valid_h) — pixels at or past the extent render white
    (Y=255, Cb=Cr=128), matching the RGB/YUV readers' background fill
    beyond the slide edge. Region geometry comes from the block grids:
    h = 8 * y_dc.shape[1], w = 8 * y_dc.shape[2].

    off: per-region (dx, dy) luma crop offsets, EVEN, in [0, 16).
    Shape-encoded mode flag: [n, 2] means the host packed the region at
    its 16-aligned origin with one extra MCU row/column (tile grids off
    the MCU lattice — the common TCGA case) and the planes crop by 16 px
    here, before the white mask; [n, 0] or None means the grid was
    aligned and the pack is exact.
    """
    ybh, ybw = y_dc.shape[1], y_dc.shape[2]
    cbh, cbw = cb_dc.shape[1], cb_dc.shape[2]
    h, w = ybh * 8, ybw * 8
    y = _idct_plane(_unpack_component(y_dc, y_bm, y_val, qt[0]), ybh, ybw)
    cb = _idct_plane(_unpack_component(cb_dc, cb_bm, cb_val, qt[1]),
                     cbh, cbw)
    cr = _idct_plane(_unpack_component(cr_dc, cr_bm, cr_val, qt[2]),
                     cbh, cbw)
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


def dct_regions_to_rgb(y_dc, y_bm, y_val, cb_dc, cb_bm, cb_val,
                       cr_dc, cr_bm, cr_val, qt, valid, off=None):
    """Sparse coefficient pack -> float32 RGB [n, h, w, 3] in 0..255,
    byte-identical to yuv420_to_rgb over host-decoded planes (the planes
    themselves match libjpeg within 1 LSB)."""
    y, cb, cr = dct_regions_to_planes(
        y_dc, y_bm, y_val, cb_dc, cb_bm, cb_val, cr_dc, cr_bm, cr_val,
        qt, valid, off)
    return yuv420_to_rgb(y, cb, cr)
