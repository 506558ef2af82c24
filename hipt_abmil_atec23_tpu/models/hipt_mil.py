"""HIPT global (WSI-level) aggregator — the pooling head of HIPT_LGP_FC.

The reference's kNN probe aggregates a slide's [N, 192] region features into
one 192-d WSI embedding using the pretrained HIPT_LGP_FC global-pooling
branch imported from the external mahmoodlab/HIPT repo
(reference: HIPT_knn.py:8-28 — ``global_phi`` Linear+ReLU, a 2-layer post-norm
torch TransformerEncoder (d_model=192, nhead=3, ffn=192), ``global_attn_pool``
gated attention, ``global_rho`` Linear+ReLU).

TPU redesign: the whole aggregation is a single jitted function over the
region-feature bag — no per-slide Python, vmappable over slides. Weights are
a plain pytree produced by :func:`hipt_lgp_params_from_torch` from the
external repo's checkpoint state dict.

Divergence note: the reference script never calls ``.eval()`` on the torch
module, so its dropouts are live at probe time; we implement deterministic
eval semantics (dropout off), which is what the DINO-probe protocol intends.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

EMBED = 192
HEADS = 3


def _linear(p, x):
    return x @ p["kernel"] + p["bias"]


def _layer_norm(p, x, eps: float = 1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _self_attention(p, x):
    """torch nn.MultiheadAttention forward (eval), batch of 1 sequence.

    x: [N, E]. in_proj is the fused [3E, E] torch layout, stored transposed.
    """
    n, e = x.shape
    hd = e // HEADS
    qkv = x @ p["in_proj_kernel"] + p["in_proj_bias"]        # [N, 3E]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, HEADS, hd).transpose(1, 0, 2)           # [H, N, hd]
    k = k.reshape(n, HEADS, hd).transpose(1, 0, 2)
    v = v.reshape(n, HEADS, hd).transpose(1, 0, 2)
    a = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(hd), axis=-1)
    out = (a @ v).transpose(1, 0, 2).reshape(n, e)
    return _linear(p["out_proj"], out)


def _encoder_layer(p, x):
    """torch nn.TransformerEncoderLayer, post-norm (norm_first=False),
    ReLU activation, eval mode (dropout off)."""
    x = _layer_norm(p["norm1"], x + _self_attention(p["attn"], x))
    ff = _linear(p["linear2"], jax.nn.relu(_linear(p["linear1"], x)))
    return _layer_norm(p["norm2"], x + ff)


def hipt_lgp_aggregate(params: Dict[str, Any], feats: jnp.ndarray
                       ) -> jnp.ndarray:
    """[N, 192] region features -> [192] WSI embedding
    (reference: HIPT_knn.py:19-27 agg_slide_feature)."""
    x = jax.nn.relu(_linear(params["phi"], feats))
    for layer in params["layers"]:
        x = _encoder_layer(layer, x)
    a = jnp.tanh(_linear(params["attn_a"], x))
    b = jax.nn.sigmoid(_linear(params["attn_b"], x))
    scores = _linear(params["attn_c"], a * b)                # [N, 1]
    w = jax.nn.softmax(scores[:, 0])                         # over regions
    pooled = w @ x                                           # [192]
    return jax.nn.relu(_linear(params["rho"], pooled))


hipt_lgp_aggregate_jit = jax.jit(hipt_lgp_aggregate)


def init_hipt_lgp_params(rng: np.random.Generator, depth: int = 2
                         ) -> Dict[str, Any]:
    """Random (xavier-normal) parameters in the converted layout — for tests
    and for running the probe without the external pretrained checkpoint."""
    def lin(n_in, n_out):
        s = float(np.sqrt(2.0 / (n_in + n_out)))
        return {"kernel": rng.normal(0, s, (n_in, n_out)).astype(np.float32),
                "bias": np.zeros(n_out, np.float32)}

    def ln():
        return {"scale": np.ones(EMBED, np.float32),
                "bias": np.zeros(EMBED, np.float32)}

    layers = []
    for _ in range(depth):
        layers.append({
            "attn": {"in_proj_kernel": lin(EMBED, 3 * EMBED)["kernel"],
                     "in_proj_bias": np.zeros(3 * EMBED, np.float32),
                     "out_proj": lin(EMBED, EMBED)},
            "norm1": ln(), "norm2": ln(),
            "linear1": lin(EMBED, EMBED), "linear2": lin(EMBED, EMBED)})
    return {"phi": lin(EMBED, EMBED), "layers": layers,
            "attn_a": lin(EMBED, EMBED), "attn_b": lin(EMBED, EMBED),
            "attn_c": lin(EMBED, 1), "rho": lin(EMBED, EMBED)}


def hipt_lgp_params_from_torch(sd: Dict[str, np.ndarray], depth: int = 2
                               ) -> Dict[str, Any]:
    """Convert the global branch of a HIPT_LGP_FC torch state dict
    (mahmoodlab/HIPT Weakly-Supervised-Subtyping checkpoint; key layout per
    reference HIPT_knn.py:13-27)."""
    def lin(prefix):
        return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    layers = []
    for i in range(depth):
        p = f"global_transformer.layers.{i}"
        layers.append({
            "attn": {
                "in_proj_kernel": np.ascontiguousarray(
                    sd[f"{p}.self_attn.in_proj_weight"].T),
                "in_proj_bias": np.asarray(sd[f"{p}.self_attn.in_proj_bias"]),
                "out_proj": lin(f"{p}.self_attn.out_proj")},
            "norm1": ln(f"{p}.norm1"), "norm2": ln(f"{p}.norm2"),
            "linear1": lin(f"{p}.linear1"), "linear2": lin(f"{p}.linear2")})
    return {"phi": lin("global_phi.0"), "layers": layers,
            "attn_a": lin("global_attn_pool.attention_a.0"),
            "attn_b": lin("global_attn_pool.attention_b.0"),
            "attn_c": lin("global_attn_pool.attention_c"),
            "rho": lin("global_rho.0")}
