"""LeViT-style hybrid conv/attention texture encoder (384-d).

Fills the reference's ``levit_128s``/``levit_256`` slot — a fast texture
feature model used for DRAS textural sampling and as an encode option
(reference: extract_features_fp.py:211-212, utils/sampling_utils.py texture
features). The reference pulls timm's pretrained LeViT; timm isn't in this
image and no weights ship, so this is a native Flax implementation of the
LeViT shape (conv-16x-downsampling stem + 3 attention stages with stride-2
shrink blocks + global pool). Divergence documented: attention-bias tables
are omitted (pos info comes from the conv stem), so timm checkpoints are not
directly loadable; the capability (fast 384-d texture embeddings) is.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


class ConvBNHS(nn.Module):
    features: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        return hardswish(x)


class LeViTAttention(nn.Module):
    dim: int
    key_dim: int = 16
    num_heads: int = 4
    stride: int = 1          # 2 => query-subsampled shrink block
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        nh = self.num_heads
        kd = self.key_dim
        q_in = x[:, ::self.stride, ::self.stride, :]
        qh, qw = q_in.shape[1], q_in.shape[2]
        q = nn.Dense(nh * kd, dtype=self.dtype, name="q")(
            q_in.reshape(b, qh * qw, c))
        k = nn.Dense(nh * kd, dtype=self.dtype, name="k")(x.reshape(b, h * w, c))
        v = nn.Dense(nh * 2 * kd, dtype=self.dtype, name="v")(
            x.reshape(b, h * w, c))
        q = q.reshape(b, -1, nh, kd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, nh, kd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, nh, 2 * kd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (kd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, qh * qw, nh * 2 * kd)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(hardswish(out))
        return out.reshape(b, qh, qw, self.dim)


class LeViTBlock(nn.Module):
    dim: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = LeViTAttention(self.dim, num_heads=self.num_heads,
                           dtype=self.dtype, name="attn")(x)
        x = x + y
        h = nn.Dense(self.dim * 2, dtype=self.dtype, name="mlp1")(x)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(hardswish(h))
        return x + h


class LeViT(nn.Module):
    """Stem 16x downsample -> stages with shrink attention -> mean pool."""
    dims: Sequence[int] = (128, 256, 384)
    depths: Sequence[int] = (2, 3, 4)
    heads: Sequence[int] = (4, 6, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, 224, 224, 3] normalized
        x = x.astype(self.dtype)
        for f in (16, 32, 64, self.dims[0]):
            x = ConvBNHS(f, dtype=self.dtype)(x)          # /16 -> 14x14
        for si, (dim, depth, nh) in enumerate(zip(self.dims, self.depths,
                                                  self.heads)):
            if si > 0:  # shrink: stride-2 query subsample + dim up
                x = LeViTAttention(dim, num_heads=nh, stride=2,
                                   dtype=self.dtype, name=f"shrink{si}")(x)
            for bi in range(depth):
                x = LeViTBlock(dim, num_heads=nh, dtype=self.dtype,
                               name=f"stage{si}_block{bi}")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B, 384]


def levit_texture_encoder(dtype=jnp.float32) -> LeViT:
    return LeViT(dtype=dtype)
