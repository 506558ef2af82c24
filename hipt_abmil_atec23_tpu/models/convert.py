"""Torch-checkpoint converters: DINO ViTs, CLAM heads, ResNets -> flax params.

The reference loads DINO checkpoints by taking the 'teacher' key and stripping
'module.'/'backbone.' prefixes (reference: HIPT_4K/hipt_model_utils.py:39-110),
and CLAM eval strips 'instance_loss_fn' keys and renames '.module'
(reference: utils/eval_utils.py:51-57). These converters reproduce those
loading rules and map tensors into this package's flax parameter trees so
pretrained reference artifacts run unchanged on TPU.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def load_torch_state_dict(path: str, checkpoint_key: str = "teacher"
                          ) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint with the reference's loading conventions:
    DINO ('teacher' key, 'module.'/'backbone.' prefixes —
    HIPT_4K/hipt_model_utils.py:39-110) and the Histo self-supervised
    ResNet layout ({'state_dict': ...} with 'model.'/'resnet.' prefixes —
    models/resnet_custom.py:112-135)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    histo_layout = False
    if checkpoint_key and checkpoint_key in sd:
        sd = sd[checkpoint_key]
    elif isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]  # lightning-style wrapper (Histo ResNet ckpt)
        histo_layout = True
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # PREFIX strips only (an interior '.model.'/'.backbone.' must survive:
    # a substring replace would silently rename/collide unrelated keys).
    # 'module.'/'backbone.' are the DINO wrappers and may stack; the
    # 'model.'/'resnet.' strips belong to the Histo {'state_dict': ...}
    # layout exclusively (resnet_custom.py:112-135).
    prefixes = ["module.", "backbone."]
    if histo_layout:
        prefixes += ["model.", "resnet."]
    out = {}
    for k, v in sd.items():
        changed = True
        while changed:
            changed = False
            for p in prefixes:
                if k.startswith(p):
                    k = k[len(p):]
                    changed = True
        out[k] = _np(v)
    return out


def _linear(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _layernorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _vit_block(sd, prefix):
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": {"qkv": _linear(sd, f"{prefix}.attn.qkv"),
                 "proj": _linear(sd, f"{prefix}.attn.proj")},
        "mlp": {"fc1": _linear(sd, f"{prefix}.mlp.fc1"),
                "fc2": _linear(sd, f"{prefix}.mlp.fc2")},
    }


def vit256_params_from_torch(sd: Dict[str, np.ndarray], depth: int = 12
                             ) -> Dict[str, Any]:
    """DINO ViT-small state_dict -> VisionTransformer params.

    The stride-16 patch conv weight [D, 3, 16, 16] becomes our patch-GEMM
    kernel [(16*16*3), D] with (kh, kw, c) tap order (models/vit.py:_patchify).
    """
    w = _np(sd["patch_embed.proj.weight"])            # [D, 3, 16, 16]
    d = w.shape[0]
    patch_kernel = w.transpose(2, 3, 1, 0).reshape(-1, d)
    p = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "patch_kernel": patch_kernel,
        "patch_bias": _np(sd["patch_embed.proj.bias"]),
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        p[f"block{i}"] = _vit_block(sd, f"blocks.{i}")
    return {"params": p}


def vit4k_params_from_torch(sd: Dict[str, np.ndarray], depth: int = 6
                            ) -> Dict[str, Any]:
    """DINO ViT-4K (vit4k_xs) state_dict -> VisionTransformer4K params."""
    p = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "phi": _linear(sd, "phi.0"),
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        p[f"block{i}"] = _vit_block(sd, f"blocks.{i}")
    return {"params": p}


def hipt_params_from_torch(sd256: Dict[str, np.ndarray],
                           sd4k: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"params": {
        "vit256": vit256_params_from_torch(sd256)["params"],
        "vit4k": vit4k_params_from_torch(sd4k)["params"],
    }}


# --------------------------------------------------------------------------
# CLAM heads (reference checkpoint layout: models/model_clam.py, with eval-time
# key cleanup from utils/eval_utils.py:51-57)
# --------------------------------------------------------------------------

def clam_params_from_torch(sd: Dict[str, np.ndarray], n_classes: int = 2,
                           multi_branch: bool = False) -> Dict[str, Any]:
    """Torch CLAM_SB/MB state_dict -> our CLAM params.

    Handles both layouts: with dropout the gated attention sits at
    attention_net.3 (fc = Linear,ReLU,Dropout,Attn), without at
    attention_net.2; '.module' wrappers and 'instance_loss_fn.*' buffers are
    stripped per the reference's eval loader.
    """
    sd = {k.replace(".module", ""): v for k, v in sd.items()
          if "instance_loss_fn" not in k}
    attn_idx = 3 if any(k.startswith("attention_net.3.") for k in sd) else 2
    a = f"attention_net.{attn_idx}"
    gated = f"{a}.attention_a.0.weight" in sd
    if gated:
        attention = {
            "attn_a": _linear(sd, f"{a}.attention_a.0"),
            "attn_b": _linear(sd, f"{a}.attention_b.0"),
            "attn_c": _linear(sd, f"{a}.attention_c"),
        }
    else:
        attention = {
            "attn_a": _linear(sd, f"{a}.module.0"),
            "attn_c": _linear(sd, f"{a}.module.3"
                              if f"{a}.module.3.weight" in sd else f"{a}.module.2"),
        }
    p: Dict[str, Any] = {
        "fc": _linear(sd, "attention_net.0"),
        "attention": attention,
    }
    if multi_branch:
        p["bag_w"] = np.stack([_np(sd[f"classifiers.{c}.weight"])[0]
                               for c in range(n_classes)])
        p["bag_b"] = np.stack([_np(sd[f"classifiers.{c}.bias"])[0]
                               for c in range(n_classes)])
    else:
        p["classifier"] = _linear(sd, "classifiers")
    if f"instance_classifiers.0.weight" in sd:
        p["instance_w"] = np.stack(
            [_np(sd[f"instance_classifiers.{c}.weight"]).T
             for c in range(n_classes)])
        p["instance_b"] = np.stack(
            [_np(sd[f"instance_classifiers.{c}.bias"])
             for c in range(n_classes)])
    return {"params": p}


def clam_params_to_torch(params: Dict[str, Any], multi_branch: bool = False,
                         with_dropout: bool = False) -> Dict[str, Any]:
    """Export our CLAM params to a reference-layout torch state_dict so
    models trained here load in the PyTorch reference."""
    import torch
    p = params["params"]
    t = lambda a: torch.tensor(np.asarray(a))
    attn_idx = 3 if with_dropout else 2
    a = f"attention_net.{attn_idx}"
    sd = {
        "attention_net.0.weight": t(p["fc"]["kernel"]).T.contiguous(),
        "attention_net.0.bias": t(p["fc"]["bias"]),
        f"{a}.attention_a.0.weight": t(p["attention"]["attn_a"]["kernel"]).T.contiguous(),
        f"{a}.attention_a.0.bias": t(p["attention"]["attn_a"]["bias"]),
        f"{a}.attention_b.0.weight": t(p["attention"]["attn_b"]["kernel"]).T.contiguous(),
        f"{a}.attention_b.0.bias": t(p["attention"]["attn_b"]["bias"]),
        f"{a}.attention_c.weight": t(p["attention"]["attn_c"]["kernel"]).T.contiguous(),
        f"{a}.attention_c.bias": t(p["attention"]["attn_c"]["bias"]),
    }
    if multi_branch:
        for c in range(p["bag_w"].shape[0]):
            sd[f"classifiers.{c}.weight"] = t(p["bag_w"][c])[None, :]
            sd[f"classifiers.{c}.bias"] = t(p["bag_b"][c])[None]
    else:
        sd["classifiers.weight"] = t(p["classifier"]["kernel"]).T.contiguous()
        sd["classifiers.bias"] = t(p["classifier"]["bias"])
    if "instance_w" in p:
        for c in range(p["instance_w"].shape[0]):
            sd[f"instance_classifiers.{c}.weight"] = t(p["instance_w"][c]).T.contiguous()
            sd[f"instance_classifiers.{c}.bias"] = t(p["instance_b"][c])
    return sd


# --------------------------------------------------------------------------
# ResNets (reference layout: models/resnet_custom.py / torchvision)
# --------------------------------------------------------------------------

def _conv(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, key):
    return ({"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])},
            {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])})


def _convbn(sd, conv_key, bn_key):
    bn_p, bn_s = _bn(sd, bn_key)
    return {"conv": _conv(sd, conv_key), "bn": bn_p}, {"bn": bn_s}


def resnet_params_from_torch(sd: Dict[str, np.ndarray],
                             layers=(3, 4, 6), bottleneck: bool = True
                             ) -> Dict[str, Any]:
    """Torch ResNet state_dict (reference ResNet_Baseline or torchvision
    layout) -> ResNetTrunk variables ({'params', 'batch_stats'})."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _convbn(sd, "conv1", "bn1")
    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            name = f"layer{li + 1}_{bi}"
            tp = f"layer{li + 1}.{bi}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for k in range(1, n_convs + 1):
                p[f"cb{k}"], s[f"cb{k}"] = _convbn(
                    sd, f"{tp}.conv{k}", f"{tp}.bn{k}")
            if f"{tp}.downsample.0.weight" in sd:
                p["down"], s["down"] = _convbn(
                    sd, f"{tp}.downsample.0", f"{tp}.downsample.1")
            params[name] = p
            stats[name] = s
    return {"params": params, "batch_stats": stats}
