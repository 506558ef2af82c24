"""HIPT_4K: hierarchical ViT-256 -> ViT-4K region encoder, fused for TPU.

The reference pipelines the two stages across two GPUs with a host bounce and
a Python minibatch-of-256 loop (reference: HIPT_4K/hipt_4k.py:36-76):
  crop -> unfold to [B,3,256,256] -> for chunks of 256: ViT-256 -> .cpu()
  -> restack -> .to(device4k) -> ViT-4K.
Here the whole thing is ONE jitted graph: all sub-tiles are a batch dimension
through ViT-256, the CLS grid reshapes in-register, and ViT-4K consumes it
directly — no host transfer, no chunking loop, bfloat16 on the MXU end to end.

Outputs match the reference contract:
  encode_regions       -> [R, 192]  ViT-4K CLS      (hipt_4k.py:48-76)
  encode_regions_assets-> dict with cls256 [R,gh*gw,384], mean-256 [R,384],
                          cls4k [R,192], concat [R,576] (forward_asset_dict,
                          hipt_4k.py:79-118)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hipt_abmil_atec23_tpu.models.vit import (
    VisionTransformer, VisionTransformer4K, ViTConfig, ViT4KConfig,
    VIT_CONFIGS,
)


def hipt_eval_normalize(x_uint8: jax.Array) -> jax.Array:
    """HIPT eval transform: ToTensor + Normalize(0.5, 0.5)
    (reference: HIPT_4K/hipt_model_utils.py:113-118) => x/127.5 - 1."""
    return x_uint8.astype(jnp.float32) / 127.5 - 1.0


def center_crop_multiple(x: np.ndarray, multiple: int = 256) -> np.ndarray:
    """Host-side: center-crop H and W down to multiples of `multiple`
    (reference: prepare_img_tensor, hipt_4k.py:308-330)."""
    h, w = x.shape[-3], x.shape[-2]
    nh, nw = (h // multiple) * multiple, (w // multiple) * multiple
    top, left = (h - nh) // 2, (w - nw) // 2
    return x[..., top:top + nh, left:left + nw, :]


class HIPT4K(nn.Module):
    """Fused hierarchical encoder. Input: [R, H, W, 3] float (already
    normalized) with H, W multiples of 256. Output: [R, 192]."""

    vit256_config: ViTConfig = VIT_CONFIGS["vit_small"]
    vit4k_config: ViT4KConfig = ViT4KConfig()

    def setup(self):
        self.vit256 = VisionTransformer(self.vit256_config, name="vit256")
        self.vit4k = VisionTransformer4K(self.vit4k_config, name="vit4k")

    def _tile_cls(self, regions: jax.Array) -> Tuple[jax.Array, int, int]:
        r, h, w, c = regions.shape
        gh, gw = h // 256, w // 256
        tiles = regions.reshape(r, gh, 256, gw, 256, c)
        tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(
            r * gh * gw, 256, 256, c)
        cls256 = self.vit256(tiles)                       # [R*gh*gw, 384]
        return cls256.reshape(r, gh, gw, -1), gh, gw

    def __call__(self, regions: jax.Array) -> jax.Array:
        grid, _, _ = self._tile_cls(regions)
        return self.vit4k(grid)                           # [R, 192]

    def asset_dict(self, regions: jax.Array) -> Dict[str, jax.Array]:
        grid, gh, gw = self._tile_cls(regions)
        r = regions.shape[0]
        cls256 = grid.reshape(r, gh * gw, -1)
        mean256 = jnp.mean(cls256, axis=1)
        cls4k = self.vit4k(grid)
        return {
            "features_cls256": cls256,
            "features_mean256": mean256,
            "features_cls4k": cls4k,
            "features_mean256_cls4k": jnp.concatenate([mean256, cls4k], axis=-1),
        }

    def region_attention(self, regions: jax.Array):
        """Both levels' last-block self-attention for hierarchical heatmaps
        (reference: _get_region_attention_scores, hipt_4k.py:121-164).
        Returns (attn256 [R*gh*gw, heads, 257, 257], attn4k [R, heads, N4k, N4k])."""
        r, h, w, c = regions.shape
        gh, gw = h // 256, w // 256
        tiles = regions.reshape(r, gh, 256, gw, 256, c)
        tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(r * gh * gw, 256, 256, c)
        attn256 = self.vit256.get_last_selfattention(tiles)
        cls256 = self.vit256(tiles).reshape(r, gh, gw, -1)
        attn4k = self.vit4k.get_last_selfattention(cls256)
        return attn256, attn4k


def make_hipt_encoder(dtype=jnp.bfloat16, use_flash: bool = False,
                      use_fused_mlp: bool = False,
                      use_fused_block: bool = False) -> HIPT4K:
    """Production config: bfloat16 compute through both ViTs. On TPU,
    use_fused_block runs each transformer block as ONE Pallas kernel
    (ops/fused_block.py, measured 94.7 TFLOP/s vs 44.6 for the separate
    flash-attention + fused-MLP kernels); the older per-op kernels remain
    selectable for comparison."""
    v256 = dataclasses.replace(VIT_CONFIGS["vit_small"], dtype=dtype,
                               use_flash=use_flash,
                               use_fused_mlp=use_fused_mlp,
                               use_fused_block=use_fused_block)
    v4k = ViT4KConfig(dtype=dtype, use_flash=use_flash,
                      use_fused_mlp=use_fused_mlp,
                      use_fused_block=use_fused_block)
    return HIPT4K(vit256_config=v256, vit4k_config=v4k)
