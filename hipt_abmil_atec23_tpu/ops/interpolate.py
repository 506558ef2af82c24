"""Bicubic interpolation matching torch.nn.functional.interpolate semantics.

The DINO ViTs interpolate their position embeddings bicubically when the
token grid differs from the 14x14 pretraining grid (reference:
HIPT_4K/vision_transformer.py:213-233, vision_transformer4k.py:201-221 — both
use torch bicubic, align_corners=False, with a +0.1 scale-factor fudge).
jax.image.resize's cubic kernel uses the Keys a=-0.5 spline while torch uses
a=-0.75, so we implement the torch kernel directly as two separable gathers —
a one-time cost at model init, but bit-accurate pos-embed parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution weights for the 4-tap neighborhood at fractional
    offset t in [0,1): taps at distances (1+t, t, 1-t, 2-t)."""
    def w(d):
        d = np.abs(d)
        return np.where(
            d <= 1, ((a + 2) * d - (a + 3)) * d * d + 1,
            np.where(d < 2, (((d - 5) * d + 8) * d - 4) * a, 0.0))
    return np.stack([w(1 + t), w(t), w(1 - t), w(2 - t)], axis=-1)


def _axis_plan(in_size: int, out_size: int,
               scale: Optional[float]) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel source taps + weights (align_corners=False).

    When `scale` is given, coordinates map with it directly (torch's
    recompute_scale_factor=False behavior used by the reference's
    scale_factor=(w0+0.1)/sqrt(N) call); otherwise scale = in/out.
    """
    s = (in_size / out_size) if scale is None else 1.0 / scale
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * s - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    weights = _cubic_weights(t)                    # [out, 4]
    taps = i0[:, None] + np.arange(-1, 3)[None, :]  # [out, 4]
    taps = np.clip(taps, 0, in_size - 1)
    return taps, weights.astype(np.float32)


def bicubic_resize_2d(x: jax.Array, out_hw: Tuple[int, int],
                      scale_hw: Optional[Tuple[float, float]] = None) -> jax.Array:
    """Resize [..., H, W, C] bicubically with torch semantics."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    taps_h, w_h = _axis_plan(h_in, h_out, scale_hw[0] if scale_hw else None)
    taps_w, w_w = _axis_plan(w_in, w_out, scale_hw[1] if scale_hw else None)

    # rows: gather 4 taps per output row and contract
    xr = x[..., taps_h, :, :]                    # [..., h_out, 4, W, C]
    xr = jnp.einsum("...htwc,ht->...hwc", xr, jnp.asarray(w_h))
    xc = xr[..., :, taps_w, :]                   # [..., h_out, w_out, 4, C]
    return jnp.einsum("...hwtc,wt->...hwc", xc, jnp.asarray(w_w))


def interpolate_pos_embed(pos_embed: jax.Array, grid_hw: Tuple[int, int]
                          ) -> jax.Array:
    """DINO-style pos-embed interpolation (reference:
    vision_transformer.py:213-233): keep the CLS slot, bicubically resize the
    S x S patch grid to grid_hw with the reference's +0.1 scale fudge."""
    n = pos_embed.shape[1] - 1
    dim = pos_embed.shape[2]
    s = int(round(np.sqrt(n)))
    gh, gw = grid_hw
    if (gh, gw) == (s, s):
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, s, s, dim)
    scale = ((gh + 0.1) / s, (gw + 0.1) / s)
    resized = bicubic_resize_2d(patch_pe, (gh, gw), scale)
    return jnp.concatenate([cls_pe, resized.reshape(1, gh * gw, dim)], axis=1)
