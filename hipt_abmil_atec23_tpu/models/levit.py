"""LeViT hybrid conv/attention texture encoder — faithful architecture.

Fills the reference's LeViT slot: `timm.create_model('levit_256')` used as a
fast texture feature model for DRAS textural sampling and as an encode option
(reference: extract_features_fp.py:211-212, utils/core_utils.py:115-116).

This is the original LeViT architecture (Graham et al., ICCV 2021):
conv-16x stem -> 3 attention stages with learned relative attention-bias
tables -> stride-2 query-subsampled shrink attention between stages ->
mean-pooled features. Both `levit_128s` (384-d) and `levit_256` (512-d,
the one the reference instantiates) specs are provided.

TPU-first design decisions:
- inference-only, so every Linear+BN1d / Conv+BN2d pair is folded into a
  single biased linear/conv at conversion time (exact at eval; the original
  repo's own `fuse()` does the same) — fewer HBM round trips, bigger GEMMs;
- attention-bias gather tables are precomputed host-side per static
  resolution and baked into the params pytree (XLA constant-folds the
  gather), so the hot path is pure batched matmul + softmax on the MXU;
- plain params-pytree apply function (no framework Module) — trivially
  jittable/vmappable and directly producible from a torch checkpoint via
  :func:`levit_params_from_torch`.
"""
from __future__ import annotations

import itertools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SPECS: Dict[str, Dict[str, Any]] = {
    # (embed_dim per stage, key_dim, num_heads per stage, depth per stage)
    "levit_128s": dict(embed_dim=(128, 256, 384), key_dim=16,
                       num_heads=(4, 6, 8), depth=(2, 3, 4)),
    "levit_256": dict(embed_dim=(256, 384, 512), key_dim=32,
                      num_heads=(4, 6, 8), depth=(4, 4, 4)),
}
ATTN_RATIO = 2          # v width multiple in stage attention
SUB_ATTN_RATIO = 4      # v width multiple in subsample attention
MLP_RATIO = 2
BN_EPS = 1e-5


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


# --------------------------------------------------------------------------
# Attention-bias index tables (host-side, static per resolution)
# --------------------------------------------------------------------------

def _bias_idxs(res: int) -> Tuple[np.ndarray, int]:
    """[N, N] indices into the per-head offset table (original LeViT
    Attention.__init__ semantics: unique |dx|,|dy| offsets)."""
    points = list(itertools.product(range(res), repeat=2))
    offsets: Dict[Tuple[int, int], int] = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            idxs.append(offsets.setdefault(off, len(offsets)))
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


def _sub_bias_idxs(res: int, stride: int) -> Tuple[np.ndarray, int, int]:
    """[N_, N] indices for the subsample attention (queries on the strided
    grid, keys on the full grid)."""
    res_ = (res - 1) // stride + 1
    points = list(itertools.product(range(res), repeat=2))
    points_ = list(itertools.product(range(res_), repeat=2))
    offsets: Dict[Tuple[float, float], int] = {}
    idxs = []
    for p1 in points_:
        for p2 in points:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            idxs.append(offsets.setdefault(off, len(offsets)))
    return (np.asarray(idxs, np.int32).reshape(len(points_), len(points)),
            len(offsets), res_)


# --------------------------------------------------------------------------
# Forward (eval) — params are folded linear/conv weights
# --------------------------------------------------------------------------

def _lin(p, x):
    return x @ p["kernel"] + p["bias"]


def _attention(p, x, *, nh: int, kd: int, ratio: int, dtype):
    """Stage attention with residual. x: [B, N, C]."""
    b, n, c = x.shape
    d = ratio * kd
    qkv = _lin(p["qkv"], x).reshape(b, n, nh, 2 * kd + d)
    q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * (kd ** -0.5)
    attn = attn + p["bias_table"][:, p["bias_idxs"]]
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    out = _lin(p["proj"], hardswish(out.reshape(b, n, nh * d)))
    return x + out


def _mlp(p, x):
    return x + _lin(p["lin2"], hardswish(_lin(p["lin1"], x)))


def _subsample_attention(p, x, *, res: int, stride: int, nh: int, kd: int,
                         dtype):
    """Shrink block: queries from the strided grid, dim change, no residual.
    x: [B, N, C] -> [B, N_, C_out]."""
    b, n, c = x.shape
    d = SUB_ATTN_RATIO * kd
    kv = _lin(p["kv"], x).reshape(b, n, nh, kd + d)
    k, v = jnp.split(kv, [kd], axis=-1)
    xq = x.reshape(b, res, res, c)[:, ::stride, ::stride, :]
    n_ = xq.shape[1] * xq.shape[2]
    q = _lin(p["q"], xq.reshape(b, n_, c)).reshape(b, n_, nh, kd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * (kd ** -0.5)
    attn = attn + p["bias_table"][:, p["bias_idxs"]]
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    return _lin(p["proj"], hardswish(out.reshape(b, n_, nh * d)))


class LeViT:
    """Params-pytree LeViT with a flax-like init/apply interface.

    ``apply(params, x)``: float [B, 224, 224, 3] (normalized) -> [B, D]
    mean-pooled features (timm ``num_classes=0`` semantics).
    """

    def __init__(self, spec: str = "levit_128s", dtype: Any = jnp.float32,
                 img_size: int = 224):
        self.spec_name = spec
        self.spec = SPECS[spec]
        self.dtype = dtype
        self.img_size = img_size
        self.res0 = img_size // 16
        self.feat_dim = self.spec["embed_dim"][-1]

    # -- structure ---------------------------------------------------------
    def _stage_plan(self) -> List[Dict[str, Any]]:
        """Flat block list mirroring the original torch ``blocks`` Sequential
        (attn/mlp pairs per stage, subsample+mlp between stages)."""
        s = self.spec
        plan, res = [], self.res0
        kd = s["key_dim"]
        for si, (dim, depth, nh) in enumerate(zip(
                s["embed_dim"], s["depth"], s["num_heads"])):
            for _ in range(depth):
                plan.append(dict(kind="attn", dim=dim, nh=nh, kd=kd, res=res))
                plan.append(dict(kind="mlp", dim=dim,
                                 hidden=MLP_RATIO * dim))
            if si + 1 < len(s["embed_dim"]):
                dim_out = s["embed_dim"][si + 1]
                plan.append(dict(kind="sub", dim=dim, dim_out=dim_out,
                                 nh=dim // kd, kd=kd, res=res, stride=2))
                res = (res - 1) // 2 + 1
                plan.append(dict(kind="mlp", dim=dim_out,
                                 hidden=MLP_RATIO * dim_out))
        return plan

    # -- init --------------------------------------------------------------
    def init(self, key, x=None) -> Dict[str, Any]:
        """Random params in the folded layout (deterministic from `key`)."""
        seed = int(jax.random.randint(key, (), 0, 2 ** 31 - 1)) \
            if hasattr(key, "dtype") else int(key)
        rng = np.random.default_rng(seed)

        def lin(n_in, n_out):
            s = float(np.sqrt(2.0 / (n_in + n_out)))
            return {"kernel": rng.normal(0, s, (n_in, n_out)
                                         ).astype(np.float32),
                    "bias": np.zeros(n_out, np.float32)}

        def conv(cin, cout):
            s = float(np.sqrt(2.0 / (9 * cin)))
            return {"kernel": rng.normal(0, s, (3, 3, cin, cout)
                                         ).astype(np.float32),
                    "bias": np.zeros(cout, np.float32)}

        d0 = self.spec["embed_dim"][0]
        params: Dict[str, Any] = {"stem": [
            conv(3, d0 // 8), conv(d0 // 8, d0 // 4),
            conv(d0 // 4, d0 // 2), conv(d0 // 2, d0)]}
        blocks = []
        for blk in self._stage_plan():
            if blk["kind"] == "attn":
                idxs, n_off = _bias_idxs(blk["res"])
                h = blk["nh"] * (2 + ATTN_RATIO) * blk["kd"]
                blocks.append({
                    "qkv": lin(blk["dim"], h),
                    "proj": lin(blk["nh"] * ATTN_RATIO * blk["kd"],
                                blk["dim"]),
                    "bias_table": np.zeros((blk["nh"], n_off), np.float32),
                    "bias_idxs": idxs})
            elif blk["kind"] == "mlp":
                blocks.append({"lin1": lin(blk["dim"], blk["hidden"]),
                               "lin2": lin(blk["hidden"], blk["dim"])})
            else:  # subsample
                idxs, n_off, _ = _sub_bias_idxs(blk["res"], blk["stride"])
                blocks.append({
                    "kv": lin(blk["dim"],
                              blk["nh"] * (1 + SUB_ATTN_RATIO) * blk["kd"]),
                    "q": lin(blk["dim"], blk["nh"] * blk["kd"]),
                    "proj": lin(blk["nh"] * SUB_ATTN_RATIO * blk["kd"],
                                blk["dim_out"]),
                    "bias_table": np.zeros((blk["nh"], n_off), np.float32),
                    "bias_idxs": idxs})
        params["blocks"] = blocks
        return params

    # -- forward -----------------------------------------------------------
    def apply(self, params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        for i, p in enumerate(params["stem"]):
            x = jax.lax.conv_general_dilated(
                x, p["kernel"].astype(dt), (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
            if i < 3:
                x = hardswish(x)
        b = x.shape[0]
        x = x.reshape(b, -1, x.shape[-1])        # [B, res0^2, C]
        for blk, p in zip(self._stage_plan(), params["blocks"]):
            p = jax.tree.map(lambda a: jnp.asarray(a).astype(
                dt if a.dtype != np.int32 else a.dtype), p)
            if blk["kind"] == "attn":
                x = _attention(p, x, nh=blk["nh"], kd=blk["kd"],
                               ratio=ATTN_RATIO, dtype=dt)
            elif blk["kind"] == "mlp":
                x = _mlp(p, x)
            else:
                x = _subsample_attention(p, x, res=blk["res"],
                                         stride=blk["stride"], nh=blk["nh"],
                                         kd=blk["kd"], dtype=dt)
        return x.mean(1).astype(jnp.float32)     # [B, feat_dim]


def levit_texture_encoder(spec: str = "levit_128s",
                          dtype=jnp.float32) -> LeViT:
    return LeViT(spec=spec, dtype=dtype)


# --------------------------------------------------------------------------
# Torch checkpoint conversion (original facebookresearch/LeViT naming, which
# is also what timm's LeViT weights fuse down to)
# --------------------------------------------------------------------------

def _fold_linear_bn(w: np.ndarray, sd: Dict[str, np.ndarray], bn: str):
    """Linear(bias=False) + BatchNorm1d -> one biased linear (eval-exact)."""
    g, b = np.asarray(sd[f"{bn}.weight"]), np.asarray(sd[f"{bn}.bias"])
    rm, rv = np.asarray(sd[f"{bn}.running_mean"]), \
        np.asarray(sd[f"{bn}.running_var"])
    scale = g / np.sqrt(rv + BN_EPS)
    return {"kernel": np.ascontiguousarray((w * scale[:, None]).T),
            "bias": (b - rm * scale).astype(np.float32)}


def _fold_conv_bn(w: np.ndarray, sd: Dict[str, np.ndarray], bn: str):
    """Conv2d(bias=False) + BatchNorm2d -> one biased HWIO conv."""
    g, b = np.asarray(sd[f"{bn}.weight"]), np.asarray(sd[f"{bn}.bias"])
    rm, rv = np.asarray(sd[f"{bn}.running_mean"]), \
        np.asarray(sd[f"{bn}.running_var"])
    scale = g / np.sqrt(rv + BN_EPS)
    w = np.asarray(w) * scale[:, None, None, None]       # OIHW
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": (b - rm * scale).astype(np.float32)}


def levit_params_from_torch(sd: Dict[str, np.ndarray],
                            spec: str = "levit_128s",
                            img_size: int = 224) -> Dict[str, Any]:
    """Convert an original-layout LeViT state dict (patch_embed.{0,2,4,6}.c/bn,
    blocks.{i}.m.qkv... — the layout the reference's timm weights derive
    from). Folds every Linear/Conv+BN pair; bias index tables are recomputed
    host-side (the checkpoint's idx buffers are redundant)."""
    model = LeViT(spec=spec, img_size=img_size)

    def lb(prefix):
        return _fold_linear_bn(np.asarray(sd[f"{prefix}.c.weight"]), sd,
                               f"{prefix}.bn")

    params: Dict[str, Any] = {"stem": [
        _fold_conv_bn(sd[f"patch_embed.{i}.c.weight"], sd,
                      f"patch_embed.{i}.bn") for i in (0, 2, 4, 6)]}
    blocks = []
    for ti, blk in enumerate(model._stage_plan()):
        p = f"blocks.{ti}"
        if blk["kind"] == "attn":
            idxs, _ = _bias_idxs(blk["res"])
            blocks.append({
                "qkv": lb(f"{p}.m.qkv"),
                "proj": lb(f"{p}.m.proj.1"),
                "bias_table": np.asarray(sd[f"{p}.m.attention_biases"],
                                         np.float32),
                "bias_idxs": idxs})
        elif blk["kind"] == "mlp":
            blocks.append({"lin1": lb(f"{p}.m.0"), "lin2": lb(f"{p}.m.2")})
        else:
            idxs, _, _ = _sub_bias_idxs(blk["res"], blk["stride"])
            blocks.append({
                "kv": lb(f"{p}.kv"),
                "q": lb(f"{p}.q.1"),
                "proj": lb(f"{p}.proj.1"),
                "bias_table": np.asarray(sd[f"{p}.attention_biases"],
                                         np.float32),
                "bias_idxs": idxs})
    params["blocks"] = blocks
    return params
