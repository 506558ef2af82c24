"""On-device JPEG YCbCr 4:2:0 -> RGB reconstruction.

TCGA slides store JPEG-coded YCbCr with 2x2-subsampled chroma; decoding to
RGB on the host triples the bytes the host link must carry to the
accelerator. The raw-plane read path (native ws_read_regions_yuv420 /
TiffSlide.read_regions_yuv420) ships the codec's planes verbatim —
1.5 bytes/px — and this module reconstructs RGB on device, fused by XLA
into the encoder's normalize + patchify.

The reconstruction mirrors libjpeg's default decode path:
- chroma upsampling = the "fancy" triangular h2v2 filter (9:3:3:1 over the
  four nearest chroma samples, jdsample.c h2v2_fancy_upsample);
- color conversion = JFIF/BT.601 (jdcolor.c):
      R = Y + 1.402 (Cr-128)
      G = Y - 0.344136 (Cb-128) - 0.714136 (Cr-128)
      B = Y + 1.772 (Cb-128)
computed in float32 (libjpeg's fixed-point rounding differs by at most
~1 LSB, far below the encoders' bf16 resolution; parity-tested against
libtiff's own full decode in tests/test_yuv_path.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _fancy_upsample_axis(c: jax.Array, axis: int) -> jax.Array:
    """2x triangular upsample along `axis` (libjpeg 'fancy'): output sample
    2i = (3 c[i] + c[i-1]) / 4, 2i+1 = (3 c[i] + c[i+1]) / 4, edges clamped."""
    lo = [slice(None)] * c.ndim
    hi = [slice(None)] * c.ndim
    lo[axis] = slice(0, 1)
    hi[axis] = slice(-1, None)
    cm1 = jnp.concatenate(
        [c[tuple(lo)], jax.lax.slice_in_dim(c, 0, c.shape[axis] - 1,
                                            axis=axis)], axis=axis)
    cp1 = jnp.concatenate(
        [jax.lax.slice_in_dim(c, 1, c.shape[axis], axis=axis),
         c[tuple(hi)]], axis=axis)
    even = (3.0 * c + cm1) * 0.25
    odd = (3.0 * c + cp1) * 0.25
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(c.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def yuv420_to_rgb(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """uint8 planes Y [..., H, W], Cb/Cr [..., H/2, W/2] -> float32 RGB
    [..., H, W, 3] in 0..255 (unclipped values clamped like libjpeg)."""
    yf = y.astype(jnp.float32)
    cbf = cb.astype(jnp.float32) - 128.0
    crf = cr.astype(jnp.float32) - 128.0
    h_axis = y.ndim - 2
    cbu = _fancy_upsample_axis(_fancy_upsample_axis(cbf, h_axis), h_axis + 1)
    cru = _fancy_upsample_axis(_fancy_upsample_axis(crf, h_axis), h_axis + 1)
    r = yf + 1.402 * cru
    g = yf - 0.344136 * cbu - 0.714136 * cru
    b = yf + 1.772 * cbu
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def yuv422_to_rgb(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """uint8 planes Y [..., H, W], Cb/Cr [..., H, W/2] -> float32 RGB
    [..., H, W, 3]. The 4:2:2 variant (horizontal-only chroma subsampling,
    libjpeg h2v1_fancy_upsample) — Aperio JPEG2000 .svs commonly store YCC
    components at this layout (comp dx=2, dy=1)."""
    yf = y.astype(jnp.float32)
    cbf = cb.astype(jnp.float32) - 128.0
    crf = cr.astype(jnp.float32) - 128.0
    w_axis = y.ndim - 1
    cbu = _fancy_upsample_axis(cbf, w_axis)
    cru = _fancy_upsample_axis(crf, w_axis)
    r = yf + 1.402 * cru
    g = yf - 0.344136 * cbu - 0.714136 * cru
    b = yf + 1.772 * cbu
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def yuv_planes_to_rgb(y: jax.Array, cb: jax.Array,
                      cr: jax.Array) -> jax.Array:
    """Shape-dispatching plane reconstruction: 4:2:0 when the chroma row
    count is half of Y's, 4:2:2 when it matches. Static-shape dispatch, so
    each jit entry traces exactly one branch — the 4:2:0 trace is the same
    graph yuv420_to_rgb always produced (compile-cache compatible)."""
    if cb.shape[-2] * 2 == y.shape[-2]:
        return yuv420_to_rgb(y, cb, cr)
    if cb.shape[-2] == y.shape[-2] and cb.shape[-1] * 2 == y.shape[-1]:
        return yuv422_to_rgb(y, cb, cr)
    raise ValueError(
        f"unsupported plane geometry: Y {y.shape}, chroma {cb.shape} "
        "(expected 4:2:0 [H/2, W/2] or 4:2:2 [H, W/2])")
