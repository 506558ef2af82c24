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


class TrainStateCheckpointer:
    """Orbax-managed per-epoch train-state checkpoints with retention.

    The reference saves (model, optimizer) tuples every epoch during tuning
    under Ray's ``tune.checkpoint_dir`` (reference: core_utils_tuning.py:
    235-240); here an orbax ``CheckpointManager`` provides the same per-epoch
    resume points with bounded retention and (optionally) async saves that
    overlap checkpoint I/O with the next epoch's compute — the TPU-idiomatic
    replacement for torch.save on the training thread.
    """

    def __init__(self, directory: str, max_to_keep: int = 2,
                 async_save: bool = True):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save))

    def save(self, step: int, params: Any, opt_state: Any) -> None:
        self.mgr.save(step, args=self._ocp.args.StandardSave(
            {"params": params, "opt_state": opt_state}))

    def restore(self, params_template: Any, opt_state_template: Any,
                step: int | None = None):
        """Returns (params, opt_state, step). step=None -> latest."""
        if step is None:
            step = self.mgr.latest_step()
        out = self.mgr.restore(step, args=self._ocp.args.StandardRestore(
            {"params": params_template, "opt_state": opt_state_template}))
        return out["params"], out["opt_state"], step

    def latest_step(self):
        return self.mgr.latest_step()

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
