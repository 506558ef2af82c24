"""Fold-parallel cross-validation: all K folds train simultaneously, one per
mesh slice.

The reference trains folds in a serial Python loop (reference:
main.py:231-282). Here fold is a batch dimension: parameters, optimizer state
and epoch data carry a leading [F] axis, the train epoch is ``vmap`` over that
axis, and the arrays are sharded over the mesh's 'fold' axis so each fold's
compute lands on its own chip(s). Early stopping is a per-fold best-so-far
parameter swap done with ``jnp.where`` on device — no host round-trip of
weights.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hipt_abmil_atec23_tpu.data.bags import BagDataset, epoch_order
from hipt_abmil_atec23_tpu.engine import metrics as M
from hipt_abmil_atec23_tpu.engine.train import StepFns, build_step_fns, _epoch_tensors
from hipt_abmil_atec23_tpu.utils.config import ExperimentConfig
from hipt_abmil_atec23_tpu.utils.seeding import host_rng, jax_key


@dataclass
class FoldParallelResult:
    summary: Dict[str, np.ndarray]      # per-fold arrays
    best_params: Any                    # stacked [F, ...]
    histories: List[List[Dict[str, float]]]


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def train_folds_parallel(
    cfg: ExperimentConfig,
    fold_datasets: List[Tuple[BagDataset, BagDataset, BagDataset]],
    class_counts: np.ndarray,
    mesh: Optional[Mesh] = None,
    *,
    verbose: bool = True,
) -> FoldParallelResult:
    """Train all folds at once. All folds share static shapes: steps per epoch
    = max train-split size (weighted sampling draws with replacement, so
    oversampling smaller folds is well-defined); bags padded to a common N."""
    tc = cfg.train
    n_folds = len(fold_datasets)
    bs = max(1, cfg.bags.batch_size)

    feat_dim = fold_datasets[0][0]._full_bag(
        fold_datasets[0][0].slide_ids[0]).shape[1]
    n_pad = max(max(tr.pad_size(), va.pad_size(), te.pad_size())
                for tr, va, te in fold_datasets)
    for tr, va, te in fold_datasets:
        tr._feat_dim = va._feat_dim = te._feat_dim = feat_dim
    steps = max(len(tr) for tr, _, _ in fold_datasets) // bs
    val_n = max(len(va) for _, va, _ in fold_datasets)

    fns = build_step_fns(cfg, class_counts, n_pad, feat_dim)

    # Stacked per-fold params/optimizer state.
    keys = [jax_key(tc.seed, f) for f in range(n_folds)]
    params = _stack_trees([fns.init_params(k) for k in keys])
    opt_state = jax.vmap(fns.tx.init)(params)

    if mesh is None:
        shard = lambda t, tail: t  # single-device fallback
    else:
        shard = lambda t, tail: jax.device_put(
            t, NamedSharding(mesh, P("fold", *([None] * tail))))
    if mesh is not None:
        params = jax.tree.map(lambda x: shard(x, x.ndim - 1), params)
        opt_state = jax.tree.map(
            lambda x: shard(x, x.ndim - 1) if hasattr(x, "ndim") and x.ndim >= 1
            and x.shape[0] == n_folds else x, opt_state)

    # fns.train_epoch is already jitted; vmap-of-jit composes fine.
    train_epoch_f = jax.jit(jax.vmap(fns.train_epoch))
    eval_batch_f = jax.jit(jax.vmap(fns.eval_batch))

    rngs = [host_rng(tc.seed, f) for f in range(n_folds)]
    key = jax_key(tc.seed, 777)

    # Per-fold early-stopping state (host scalars; params swap on device).
    best_val = np.full(n_folds, np.inf)
    counters = np.zeros(n_folds, np.int64)
    stopped = np.zeros(n_folds, bool)
    best_started = np.zeros(n_folds, bool)
    best_params = params
    histories: List[List[Dict[str, float]]] = [[] for _ in range(n_folds)]

    def _build_epoch_data():
        f = np.zeros((n_folds, steps, bs, n_pad, feat_dim), np.float32)
        m = np.zeros((n_folds, steps, bs, n_pad), bool)
        l = np.zeros((n_folds, steps, bs), np.int32)
        for i, (tr, _, _) in enumerate(fold_datasets):
            order = epoch_order(tr.labels, cfg.task.n_classes, rngs[i],
                                tc.weighted_sample)
            # oversample with replacement up to the common step count
            need = steps * bs
            if len(order) < need:
                extra = rngs[i].choice(len(tr), need - len(order), replace=True)
                order = np.concatenate([order, extra])
            fi, mi, li = _epoch_tensors(tr, order[:need], bs, n_pad, rngs[i])
            f[i], m[i], l[i] = fi, mi, li
        return f, m, l

    def _build_val_data():
        f = np.zeros((n_folds, val_n, n_pad, feat_dim), np.float32)
        m = np.zeros((n_folds, val_n, n_pad), bool)
        l = np.zeros((n_folds, val_n), np.int32)
        valid = np.zeros((n_folds, val_n), bool)
        for i, (_, va, _) in enumerate(fold_datasets):
            b = va.make_batch(list(range(len(va))), rngs[i], n_pad=n_pad,
                              train=False)
            f[i, :len(va)], m[i, :len(va)], l[i, :len(va)] = (
                b.features, b.mask, b.labels)
            valid[i, :len(va)] = True
        return f, m, l, valid

    for epoch in range(tc.max_epochs):
        f, m, l = _build_epoch_data()
        ekeys = jnp.stack([jax.random.fold_in(key, epoch * n_folds + i)
                           for i in range(n_folds)])
        new_params, new_opt, bl, inst, acc = train_epoch_f(
            params, opt_state,
            shard(jnp.asarray(f), 4), shard(jnp.asarray(m), 3),
            shard(jnp.asarray(l), 2), ekeys)
        # folds that stopped keep their old params (results ignored anyway)
        keep = jnp.asarray(~stopped)
        params = jax.tree.map(
            lambda new, old: jnp.where(
                keep.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            new_params, params)
        opt_state = new_opt

        vf, vm, vl, vvalid = _build_val_data()
        probs, nll, _ = eval_batch_f(params, shard(jnp.asarray(vf), 3),
                                     shard(jnp.asarray(vm), 2),
                                     shard(jnp.asarray(vl), 1))
        nll = np.asarray(nll)
        val_loss = (nll * vvalid).sum(1) / np.maximum(vvalid.sum(1), 1)

        # early-stopping schedule per fold (reference: core_utils.py:52-100)
        improved = np.zeros(n_folds, bool)
        for i in range(n_folds):
            if stopped[i]:
                continue
            histories[i].append(dict(epoch=epoch, val_loss=float(val_loss[i]),
                                     train_loss=float(np.asarray(bl)[i])))
            if not tc.early_stopping:
                improved[i] = True  # track latest params
                continue
            if epoch < tc.min_epochs:
                improved[i] = True
                best_val[i] = val_loss[i]
            # <= : a plateau-equal val loss re-checkpoints and resets the
            # counter, matching EarlyStopper.update (train.py) and the
            # reference's strict-< non-improvement branch
            elif not best_started[i] or val_loss[i] <= best_val[i]:
                best_started[i] = True
                best_val[i] = val_loss[i]
                counters[i] = 0
                improved[i] = True
            else:
                counters[i] += 1
                if counters[i] >= tc.patience and epoch > tc.stop_epoch:
                    stopped[i] = True
        imp = jnp.asarray(improved)
        best_params = jax.tree.map(
            lambda new, best: jnp.where(
                imp.reshape((-1,) + (1,) * (new.ndim - 1)), new, best),
            params, best_params)
        if verbose:
            print(f"[folds] epoch {epoch}: val_loss "
                  f"{np.array2string(val_loss, precision=4)} stopped {stopped}")
        if stopped.all():
            break

    # final evaluation with best params
    summary: Dict[str, np.ndarray] = {k: np.zeros(n_folds) for k in
                                      ("val_auc", "test_auc", "val_acc", "test_acc")}
    for i, (_, va, te) in enumerate(fold_datasets):
        pi = jax.tree.map(lambda x: x[i], best_params)
        for name, ds in (("val", va), ("test", te)):
            b = ds.make_batch(list(range(len(ds))), rngs[i], n_pad=n_pad,
                              train=False)
            probs, _, _ = fns.eval_batch(pi, jnp.asarray(b.features),
                                         jnp.asarray(b.mask),
                                         jnp.asarray(b.labels))
            probs = np.asarray(probs)
            summary[f"{name}_auc"][i] = M.auc_score(ds.labels, probs,
                                                    cfg.task.n_classes)
            summary[f"{name}_acc"][i] = M.accuracy(ds.labels, probs.argmax(1))
    return FoldParallelResult(summary=summary, best_params=best_params,
                              histories=histories)
