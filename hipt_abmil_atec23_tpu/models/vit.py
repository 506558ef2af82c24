"""DINO Vision Transformers: ViT-256 (patch encoder) and ViT-4K (region encoder).

Capability parity with the reference's vendored DINO ViTs
(reference: HIPT_4K/vision_transformer.py, vision_transformer4k.py),
re-designed for TPU:

- NHWC layout, bfloat16-friendly: patch embedding is a single big matmul
  (16x16x3 pixels -> embed_dim) instead of a conv — identical math, maps
  straight onto the MXU;
- attention is one fused einsum chain over [B, heads, N, hd] with optional
  Pallas flash-attention (ops/flash_attention.py) for the hot path;
- position-embedding interpolation (torch-bicubic a=-0.75, the reference's
  +0.1 scale fudge — vision_transformer.py:213-233) happens once per grid
  shape at trace time, not per forward;
- GELU is exact (erf) to match torch's nn.GELU default.

Configurations: vit_small (embed 384, depth 12, heads 6 — reference
vision_transformer.py:282-286) and vit4k_xs (input 384 -> phi -> 192, depth 6,
heads 6 — reference vision_transformer4k.py:267-272).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hipt_abmil_atec23_tpu.ops.interpolate import interpolate_pos_embed


_FUSED_BLOCK_VMEM_BUDGET = 32 << 20


def fused_block_group(batch: int, n_pad: int):
    """Largest image group the fused whole-block kernel (ops/fused_block.py)
    can run at this shape, or None when even ungrouped f32 score/exp blocks
    (2 * group * n^2 * 4 bytes) would exceed the VMEM budget — the single
    source of truth shared by the network walks (pad or not) and Block
    (fused or exact), so the two can never disagree on the dispatch.
    group=4 measured fastest at the production shape (85.5 TFLOP/s vs 81.6
    at g2 / 79.3 at g8, batch 512 x 257 x 384 bf16)."""
    return next((g for g in (4, 2, 1)
                 if batch % g == 0
                 and 2 * g * n_pad * n_pad * 4 <= _FUSED_BLOCK_VMEM_BUDGET),
                None)


def _pad_tokens(tok):
    """Pad the token axis to a sublane multiple (8) for the fused whole-block
    kernel; returns (padded tokens, original length). Every block walk under
    ``use_fused_block`` must pad once and thread ``n_valid`` so the kernel
    masks the padded keys — including the attention/intermediate extraction
    paths, not just ``__call__``. When the kernel is infeasible at this
    shape (fused_block_group is None: huge token counts), returns
    (tok unchanged, None) and Block runs its exact path — ``tok[:, :None]``
    is a full slice, so call sites need no branching."""
    b, n = tok.shape[0], tok.shape[1]
    n_pad = (n + 7) // 8 * 8
    if fused_block_group(b, n_pad) is None:
        return tok, None
    if n_pad != n:
        tok = jnp.pad(tok, ((0, 0), (0, n_pad - n), (0, 0)))
    return tok, n


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 16
    pretrain_img_size: int = 224   # pos_embed native grid = 14x14
    in_chans: int = 3
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32       # compute dtype (bfloat16 on TPU hot path)
    use_flash: bool = False        # Pallas fused attention (no HBM attn matrix)
    use_fused_mlp: bool = False    # Pallas fc1+GELU+fc2 (no HBM hidden)
    use_fused_block: bool = False  # whole block as ONE kernel (supersedes
                                   # use_flash/use_fused_mlp on the forward)


VIT_CONFIGS = {
    "vit_tiny": ViTConfig(embed_dim=192, depth=12, num_heads=3),
    "vit_small": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "vit_base": ViTConfig(embed_dim=768, depth=12, num_heads=12),
}


class _DenseParams(nn.Module):
    """Parameter shell with nn.Dense's exact tree (kernel/bias) and init,
    for kernels that consume the weights directly."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        return k, b


class _LNParams(nn.Module):
    """Parameter shell with nn.LayerNorm's exact tree (scale/bias)."""
    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones_init(),
                       (self.features,))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        return g, b


class _MlpParams(nn.Module):
    """Mlp's parameter tree (fc1/fc2) without computation — for the fused
    LN+MLP+residual kernel that consumes the weights directly."""
    hidden: int
    features: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.hidden, self.features, name="fc1")()
        w2, b2 = _DenseParams(self.features, self.hidden, name="fc2")()
        return w1, b1, w2, b2


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32
    use_fused: bool = False

    @nn.compact
    def __call__(self, x):
        if self.use_fused:
            # ONE Pallas kernel: fc1 -> exact GELU -> fc2, hidden stays in
            # VMEM (ops/fused_mlp.py); identical param tree to the Dense path
            from hipt_abmil_atec23_tpu.ops.fused_mlp import fused_mlp
            w1, b1 = _DenseParams(self.hidden, x.shape[-1], name="fc1")()
            w2, b2 = _DenseParams(self.out, self.hidden, name="fc2")()
            return fused_mlp(x.astype(self.dtype),
                             w1.astype(self.dtype), b1.astype(jnp.float32),
                             w2.astype(self.dtype), b2.astype(jnp.float32))
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is exact erf
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class Attention(nn.Module):
    """Multi-head self-attention returning (out, attn) like the reference
    (vision_transformer.py:119-131) so attention heatmaps stay available.
    With use_flash=True the softmax(QK^T)V runs as a Pallas fused kernel
    (ops/flash_attention.py) and the attention matrix never hits HBM."""
    num_heads: int
    qkv_bias: bool
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, h, hd]
        q = q.transpose(0, 2, 1, 3)  # [b, h, n, hd]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if self.use_flash and not return_attn:
            from hipt_abmil_atec23_tpu.ops.flash_attention import attention
            out = attention(q.reshape(b * self.num_heads, n, hd),
                            k.reshape(b * self.num_heads, n, hd),
                            v.reshape(b * self.num_heads, n, hd))
            out = out.reshape(b, self.num_heads, n, hd)
            attn = None
        else:
            scale = hd ** -0.5
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                             preferred_element_type=jnp.float32
                             ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return out, attn


class _AttnParams(nn.Module):
    """Attention's parameter tree (qkv/proj) without computation — for the
    fused whole-block kernel that consumes the weights directly."""
    dim: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(3 * self.dim, self.dim, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        return wqkv, bqkv, wproj, bproj


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    ln_eps: float
    dtype: Any = jnp.float32
    use_flash: bool = False
    use_fused_mlp: bool = False
    use_fused_block: bool = False

    @nn.compact
    def __call__(self, x, return_attn: bool = False,
                 n_valid: Optional[int] = None):
        c = x.shape[-1]
        if self.use_fused_block and not return_attn:
            b, n_tok = x.shape[0], x.shape[1]
            # VMEM-aware dispatch (see fused_block_group): scale the group
            # down with token count; when even group=1 would overflow
            # (n > ~2048 — no production encoder config comes close), run
            # the exact XLA path below on the same param tree.
            group = (fused_block_group(b, n_tok)
                     if n_tok % 8 == 0 else None)
            if group is not None:
                # the whole block as ONE Pallas kernel (ops/fused_block.py);
                # the caller pads tokens to a sublane multiple once per
                # network and threads n_valid down for key masking. Param
                # tree is identical to the Dense/Attention path (shells).
                assert self.qkv_bias, \
                    "fused block assumes qkv_bias=True (DINO)"
                from hipt_abmil_atec23_tpu.ops.fused_block import (
                    fused_vit_block)
                g1, be1 = _LNParams(c, name="norm1")()
                wqkv, bqkv, wproj, bproj = _AttnParams(c, name="attn")()
                g2, be2 = _LNParams(c, name="norm2")()
                w1, b1, w2, b2 = _MlpParams(int(c * self.mlp_ratio), c,
                                            name="mlp")()
                return fused_vit_block(
                    x.astype(self.dtype), g1, be1, wqkv, bqkv, wproj,
                    bproj, g2, be2, w1, b1, w2, b2,
                    num_heads=self.num_heads, n_valid=n_valid,
                    eps=self.ln_eps, group=group), None
            # fall through to the exact Dense/Attention path (same param
            # tree). The exact path has no key mask, so it must never see
            # PADDED tokens — _pad_tokens consults the same
            # fused_block_group predicate and skips padding at infeasible
            # shapes, making this unreachable with n_valid < n_tok; the
            # assert catches any out-of-tree caller that pads anyway.
            assert n_valid is None or n_valid == n_tok, (
                "token count exceeds the fused kernel's VMEM budget; run "
                "the exact path on UNPADDED tokens (padded keys would be "
                "unmasked here)")
        y, attn = Attention(self.num_heads, self.qkv_bias, self.dtype,
                            self.use_flash, name="attn")(
            nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x), return_attn)
        x = x + y
        if self.use_fused_mlp:
            # the block's whole second half as ONE Pallas kernel:
            # x + MLP(LN(x)) — ops/fused_mlp.py; param trees unchanged
            from hipt_abmil_atec23_tpu.ops.fused_mlp import (
                fused_ln_mlp_residual)
            g, be = _LNParams(c, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(int(c * self.mlp_ratio), c,
                                        name="mlp")()
            x = fused_ln_mlp_residual(
                x.astype(self.dtype), g, be,
                w1.astype(self.dtype), b1.astype(jnp.float32),
                w2.astype(self.dtype), b2.astype(jnp.float32),
                eps=self.ln_eps)
        else:
            x = x + Mlp(int(c * self.mlp_ratio), c, self.dtype,
                        name="mlp")(
                nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x))
        return x, attn


class VisionTransformer(nn.Module):
    """ViT over pixels, NHWC input [B, H, W, 3], returns CLS [B, D]."""
    config: ViTConfig = ViTConfig()

    def setup(self):
        cfg = self.config
        s = cfg.pretrain_img_size // cfg.patch_size
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.embed_dim))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, s * s + 1, cfg.embed_dim))
        # Patch embedding as a matmul over flattened 16x16x3 patches —
        # equivalent to the reference's stride-16 conv
        # (vision_transformer.py:155-170) but a single MXU-friendly GEMM.
        self.patch_kernel = self.param(
            "patch_kernel", nn.initializers.lecun_normal(),
            (cfg.patch_size * cfg.patch_size * cfg.in_chans, cfg.embed_dim))
        self.patch_bias = self.param(
            "patch_bias", nn.initializers.zeros_init(), (cfg.embed_dim,))
        self.blocks = [
            Block(cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias, cfg.ln_eps,
                  cfg.dtype, cfg.use_flash,
                  getattr(cfg, "use_fused_mlp", False),
                  getattr(cfg, "use_fused_block", False), name=f"block{i}")
            for i in range(cfg.depth)]
        self.norm = nn.LayerNorm(epsilon=cfg.ln_eps, name="norm")

    def _patchify(self, x):
        cfg = self.config
        b, h, w, c = x.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        # tap order (p, p, c) row-major matches torch conv weight layout
        # after the converter's transpose (models/convert.py).
        x = x.reshape(b, gh * gw, p * p * c)
        return x, gh, gw

    def prepare_tokens(self, x):
        cfg = self.config
        x = x.astype(cfg.dtype)
        tok, gh, gw = self._patchify(x)
        tok = tok @ self.patch_kernel.astype(cfg.dtype) + self.patch_bias
        b = tok.shape[0]
        cls = jnp.broadcast_to(self.cls_token.astype(cfg.dtype),
                               (b, 1, cfg.embed_dim))
        tok = jnp.concatenate([cls, tok], axis=1)
        pe = interpolate_pos_embed(self.pos_embed, (gh, gw))
        return tok + pe.astype(cfg.dtype)

    def __call__(self, x):
        tok = self.prepare_tokens(x)
        if getattr(self.config, "use_fused_block", False):
            # pad the token axis ONCE to a sublane multiple (not once per
            # block) and mask padded keys inside the fused block kernel
            tok, n = _pad_tokens(tok)
            for blk in self.blocks:
                tok, _ = blk(tok, n_valid=n)
            tok = tok[:, :n]
        else:
            for blk in self.blocks:
                tok, _ = blk(tok)
        tok = self.norm(tok)
        return tok[:, 0].astype(jnp.float32)

    def get_last_selfattention(self, x):
        """Self-attention of the final block (reference:
        vision_transformer.py:255-262) — drives ViT-level heatmaps."""
        tok = self.prepare_tokens(x)
        if getattr(self.config, "use_fused_block", False):
            tok, n = _pad_tokens(tok)
            for blk in self.blocks[:-1]:
                tok, _ = blk(tok, n_valid=n)
            # the final block runs the exact Attention path (return_attn)
            # over the unpadded tokens — fused blocks never see it
            tok = tok[:, :n]
        else:
            for blk in self.blocks[:-1]:
                tok, _ = blk(tok)
        _, attn = self.blocks[-1](tok, return_attn=True)
        return attn

    def get_intermediate_layers(self, x, n: int = 1):
        tok = self.prepare_tokens(x)
        fused = getattr(self.config, "use_fused_block", False)
        n_valid = None
        if fused:
            tok, n_valid = _pad_tokens(tok)
        outs = []
        for i, blk in enumerate(self.blocks):
            tok, _ = blk(tok, n_valid=n_valid)
            if len(self.blocks) - i <= n:
                outs.append(self.norm(tok[:, :n_valid] if fused else tok))
        return outs


@dataclasses.dataclass(frozen=True)
class ViT4KConfig:
    input_embed_dim: int = 384
    output_embed_dim: int = 192
    depth: int = 6
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pretrain_grid: int = 14     # 224//16 -> 196 native pos-embed slots
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_flash: bool = False
    use_fused_mlp: bool = False
    use_fused_block: bool = False


class VisionTransformer4K(nn.Module):
    """ViT over a [B, gh, gw, 384] feature grid (not pixels), returns 192-d
    CLS (reference: vision_transformer4k.py:161-246; vit4k_xs :267-272)."""
    config: ViT4KConfig = ViT4KConfig()

    def setup(self):
        cfg = self.config
        self.phi = nn.Dense(cfg.output_embed_dim, name="phi")  # + GELU below
        s = cfg.pretrain_grid
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.output_embed_dim))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, s * s + 1, cfg.output_embed_dim))
        self.blocks = [
            Block(cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias, cfg.ln_eps,
                  cfg.dtype, cfg.use_flash, cfg.use_fused_mlp,
                  getattr(cfg, "use_fused_block", False), name=f"block{i}")
            for i in range(cfg.depth)]
        self.norm = nn.LayerNorm(epsilon=cfg.ln_eps, name="norm")

    def prepare_tokens(self, grid):
        cfg = self.config
        b, gh, gw, d = grid.shape
        x = grid.reshape(b, gh * gw, d).astype(cfg.dtype)
        x = nn.gelu(self.phi(x), approximate=False)
        cls = jnp.broadcast_to(self.cls_token.astype(cfg.dtype),
                               (b, 1, cfg.output_embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        pe = interpolate_pos_embed(self.pos_embed, (gh, gw))
        return x + pe.astype(cfg.dtype)

    def __call__(self, grid):
        tok = self.prepare_tokens(grid)
        if getattr(self.config, "use_fused_block", False):
            tok, n = _pad_tokens(tok)
            for blk in self.blocks:
                tok, _ = blk(tok, n_valid=n)
            tok = tok[:, :n]
        else:
            for blk in self.blocks:
                tok, _ = blk(tok)
        tok = self.norm(tok)
        return tok[:, 0].astype(jnp.float32)

    def get_last_selfattention(self, grid):
        tok = self.prepare_tokens(grid)
        if getattr(self.config, "use_fused_block", False):
            tok, n = _pad_tokens(tok)
            for blk in self.blocks[:-1]:
                tok, _ = blk(tok, n_valid=n)
            tok = tok[:, :n]
        else:
            for blk in self.blocks[:-1]:
                tok, _ = blk(tok)
        _, attn = self.blocks[-1](tok, return_attn=True)
        return attn


class DINOHead(nn.Module):
    """DINO projection head (reference: vision_transformer.py:296-330) —
    MLP (nlayers, hidden 2048, bottleneck 256) -> L2-normalize ->
    weight-normalized last layer to out_dim prototypes. Present for
    capability parity (self-supervised pretraining of the ViTs); the
    reference never trains it either."""
    out_dim: int = 65536
    use_bn: bool = False
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        if self.nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                         name="mlp0")(x)
        else:
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp0")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=True, name="bn0")(x)
            x = nn.gelu(x, approximate=False)
            for i in range(self.nlayers - 2):
                x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                             name=f"mlp{i + 1}")(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=True,
                                     name=f"bn{i + 1}")(x)
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                         name=f"mlp{self.nlayers - 1}")(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        # weight-normalized last layer (torch weight_norm with g frozen to 1)
        v = self.param("last_layer_v", nn.initializers.normal(0.02),
                       (x.shape[-1], self.out_dim))
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-8)
        return (x @ v.astype(self.dtype)).astype(jnp.float32)


def vit_small(dtype=jnp.float32) -> VisionTransformer:
    return VisionTransformer(dataclasses.replace(VIT_CONFIGS["vit_small"],
                                                 dtype=dtype))


def vit4k_xs(dtype=jnp.float32) -> VisionTransformer4K:
    return VisionTransformer4K(ViT4KConfig(dtype=dtype))
