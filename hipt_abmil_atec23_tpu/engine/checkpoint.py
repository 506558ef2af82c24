"""Checkpointing: best-validation model weights per fold.

Mirrors the reference's contract — one checkpoint per fold at
``results_dir/s_{fold}_checkpoint.*``, written on every validation-loss
improvement (reference: utils/core_utils.py:92-100) — using flax msgpack
serialization instead of torch state_dicts. Torch-format import/export lives
in models/convert.py for artifact interop.
"""
from __future__ import annotations

import os
from typing import Any

import flax.serialization


def ckpt_path(results_dir: str, fold: int) -> str:
    return os.path.join(results_dir, f"s_{fold}_checkpoint.msgpack")


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def save_train_state(path: str, params: Any, opt_state: Any,
                     epoch: int) -> None:
    """Full (params, optimizer, epoch) checkpoint — the reference saves
    (model, optimizer) tuples per epoch during tuning
    (reference: core_utils_tuning.py:235-237)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": params, "opt_state": opt_state, "epoch": epoch}
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def load_train_state(path: str, params_template: Any,
                     opt_state_template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(
            {"params": params_template, "opt_state": opt_state_template,
             "epoch": 0}, f.read())
