"""Per-fold training engine.

Re-designs the reference's bag-at-a-time Python training loop
(reference: utils/core_utils.py:102-442) for TPU:

- one jitted ``train_epoch``: ``lax.scan`` over optimizer steps, each step a
  batch of B padded bags ([B, N, D] + mask) — B=1 reproduces the reference's
  one-slide-per-step schedule, B>1 fills the MXU;
- epoch data is assembled on host once per epoch (weighted resampling with
  replacement, bag subsampling with replacement — reference semantics,
  utils/utils.py:91, datasets/dataset_generic.py:517-519) and shipped to the
  device as one array;
- validation/test are a single batched deterministic forward;
- early stopping keeps the reference's exact schedule (min_epochs warmup,
  patience/stop_epoch, best-val-loss checkpointing —
  reference: utils/core_utils.py:52-100).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hipt_abmil_atec23_tpu.data.bags import BagDataset, epoch_order
from hipt_abmil_atec23_tpu.engine import metrics as M
from hipt_abmil_atec23_tpu.engine.checkpoint import ckpt_path, save_params, load_params
from hipt_abmil_atec23_tpu.engine.losses import (make_bag_loss,
                                                 make_per_sample_loss)
from hipt_abmil_atec23_tpu.models.abmil import build_mil_model
from hipt_abmil_atec23_tpu.utils.config import ExperimentConfig
from hipt_abmil_atec23_tpu.utils.seeding import host_rng, jax_key


# --------------------------------------------------------------------------
# Optimizer (reference: get_optim, utils/utils.py:100-107 — torch Adam/SGD
# with additive L2 weight decay folded into the gradient)
# --------------------------------------------------------------------------

def make_optimizer(opt: str, lr: float, reg: float) -> optax.GradientTransformation:
    decay = optax.add_decayed_weights(reg) if reg > 0 else optax.identity()
    if opt == "adam":
        return optax.chain(decay, optax.adam(lr))
    if opt == "sgd":
        return optax.chain(decay, optax.sgd(lr, momentum=0.9))
    raise ValueError(f"unknown optimizer {opt!r}")


# --------------------------------------------------------------------------
# Jitted step/epoch builders
# --------------------------------------------------------------------------

@dataclass
class StepFns:
    train_epoch: Callable  # (params, opt_state, feats[S,B,N,D], mask, labels, key)
    eval_batch: Callable   # (params, feats[B,N,D], mask, labels) -> (logits, loss_vec, inst)
    init_params: Callable
    tx: optax.GradientTransformation
    train_epochs_chunk: Optional[Callable] = None  # E epochs per dispatch


def build_step_fns(cfg: ExperimentConfig, class_counts: np.ndarray,
                   n_pad: int, feat_dim: int) -> StepFns:
    model = build_mil_model(
        cfg.model.model_type, size_arg=cfg.model.model_size,
        dropout=cfg.model.drop_out, n_classes=cfg.task.n_classes,
        k_sample=cfg.model.k_sample, gate=cfg.model.gate,
        subtyping=cfg.model.subtyping)
    is_clam = cfg.model.model_type in ("clam_sb", "clam_mb")
    use_inst = is_clam and not cfg.model.no_inst_cluster
    bag_loss = make_bag_loss(cfg.train.bag_loss, class_counts)
    # validation ranks epochs by the CONFIGURED loss, per slide (reference:
    # validate() applies loss_fn at batch 1, core_utils.py:464,527)
    val_loss_fn = make_per_sample_loss(cfg.train.bag_loss)
    bag_weight = cfg.train.bag_weight
    tx = make_optimizer(cfg.train.opt, cfg.train.lr, cfg.train.reg)

    def fwd_one(params, bag, mask, label, rng, deterministic):
        kwargs = dict(deterministic=deterministic)
        if is_clam:
            kwargs.update(label=label, instance_eval=use_inst)
        rngs = None if deterministic else {"dropout": rng}
        return model.apply(params, bag, mask, rngs=rngs, **kwargs)

    def batched_fwd(params, feats, mask, labels, rng, deterministic):
        rngs = jax.random.split(rng, feats.shape[0])
        return jax.vmap(
            lambda b, m, l, r: fwd_one(params, b, m, l, r, deterministic)
        )(feats, mask, labels, rngs)

    def loss_fn(params, feats, mask, labels, rng):
        out = batched_fwd(params, feats, mask, labels, rng, deterministic=False)
        logits = out.logits[:, 0, :]
        bl = bag_loss(logits, labels)
        if use_inst:
            inst = jnp.mean(out.extras["instance_loss"])
            total = bag_weight * bl + (1.0 - bag_weight) * inst
        else:
            inst = jnp.zeros(())
            total = bl
        correct = jnp.mean((out.y_hat[:, 0] == labels).astype(jnp.float32))
        return total, (bl, inst, correct)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(carry, batch):
        params, opt_state = carry
        feats, mask, labels, rng = batch
        (_, (bl, inst, correct)), grads = grad_fn(params, feats, mask, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (bl, inst, correct)

    @jax.jit
    def train_epoch(params, opt_state, feats, mask, labels, key):
        """feats [S, B, N, D]; one scan over S optimizer steps."""
        keys = jax.random.split(key, feats.shape[0])
        (params, opt_state), (bls, insts, corrects) = jax.lax.scan(
            train_step, (params, opt_state), (feats, mask, labels, keys))
        return params, opt_state, jnp.mean(bls), jnp.mean(insts), jnp.mean(corrects)

    @jax.jit
    def eval_batch(params, feats, mask, labels):
        out = batched_fwd(params, feats, mask, labels,
                          jax.random.PRNGKey(0), deterministic=True)
        logits = out.logits[:, 0, :]
        losses = val_loss_fn(logits, labels)
        inst = (out.extras["instance_loss"] if use_inst
                else jnp.zeros_like(losses))
        return jax.nn.softmax(logits, axis=-1), losses, inst

    @jax.jit
    def train_epochs_chunk(params, opt_state, feats, mask, labels,
                           v_feats, v_mask, v_labels, v_valid, key):
        """E epochs in ONE dispatch, with in-graph per-epoch validation.

        feats [E, S, B, N, D]; v_* are per-epoch validation tensors
        [E, V, ...] (the reference re-subsamples val bags every epoch).
        Returns per-epoch (params, train stats, val probs/loss) stacks —
        MIL heads are small, so snapshotting params per epoch is cheap and
        lets the host apply the EXACT reference early-stopping schedule.
        """
        e = feats.shape[0]
        keys = jax.random.split(key, e)

        def epoch_body(carry, ep):
            params, opt_state = carry
            f, m, l, vf, vm, vl, vv, k = ep
            ks = jax.random.split(k, f.shape[0])
            (params, opt_state), (bls, insts, corrects) = jax.lax.scan(
                train_step, (params, opt_state), (f, m, l, ks))
            probs, nll, _ = eval_batch(params, vf, vm, vl)
            vloss = jnp.sum(nll * vv) / jnp.maximum(jnp.sum(vv), 1.0)
            return (params, opt_state), (params, jnp.mean(bls),
                                         jnp.mean(insts), jnp.mean(corrects),
                                         probs, vloss)
        (params, opt_state), stacks = jax.lax.scan(
            epoch_body, (params, opt_state),
            (feats, mask, labels, v_feats, v_mask, v_labels, v_valid, keys))
        return params, opt_state, stacks

    def init_params(key):
        bag = jnp.zeros((n_pad, feat_dim), jnp.float32)
        mask = jnp.ones((n_pad,), bool)
        kwargs = dict(label=jnp.array(0), instance_eval=True) if is_clam else {}
        return model.init(key, bag, mask, **kwargs)

    return StepFns(train_epoch=train_epoch, eval_batch=eval_batch,
                   init_params=init_params, tx=tx,
                   train_epochs_chunk=train_epochs_chunk)


# --------------------------------------------------------------------------
# Early stopping (reference: utils/core_utils.py:52-100)
# --------------------------------------------------------------------------

class EarlyStopper:
    def __init__(self, min_epochs=50, patience=50, stop_epoch=50):
        self.min_epochs = min_epochs
        self.patience = patience
        self.stop_epoch = stop_epoch
        self.counter = 0
        self.best_score: Optional[float] = None
        self.early_stop = False
        self.save_requested = False

    def update(self, epoch: int, val_loss: float) -> bool:
        """Returns True when the current model should be checkpointed."""
        score = -val_loss
        self.save_requested = False
        if epoch < self.min_epochs:
            # Warmup: checkpoint every epoch, best tracking not yet started.
            self.save_requested = True
            return True
        # >= : the reference checkpoints and resets its counter when the
        # score EQUALS the best (its non-improvement branch is a strict
        # score < best_score, core_utils.py:80-88)
        if self.best_score is None or score >= self.best_score:
            self.best_score = score
            self.counter = 0
            self.save_requested = True
            return True
        self.counter += 1
        if self.counter >= self.patience and epoch > self.stop_epoch:
            self.early_stop = True
        return False


# --------------------------------------------------------------------------
# Per-fold training
# --------------------------------------------------------------------------

@dataclass
class FoldResult:
    fold: int
    val_auc: float
    test_auc: float
    val_acc: float
    test_acc: float
    val_loss: float
    test_loss: float
    stopped_epoch: int
    test_probs: np.ndarray
    test_labels: np.ndarray
    test_slide_ids: List[str]
    history: List[Dict[str, float]] = field(default_factory=list)


def _chunk_tensors(train_ds, val_ds, cfg, e: int, bs: int, n_pad: int,
                   rng: np.random.Generator, tc):
    """Stack E epochs of train batches + E per-epoch val subsamples."""
    parts = []
    for _ in range(e):
        order = epoch_order(train_ds.labels, cfg.task.n_classes, rng,
                            tc.weighted_sample)
        parts.append(_epoch_tensors(train_ds, order, bs, n_pad, rng))
    tr_f = np.stack([p[0] for p in parts])
    tr_m = np.stack([p[1] for p in parts])
    tr_l = np.stack([p[2] for p in parts])
    n_val = len(val_ds)
    v_f = np.zeros((e, n_val, n_pad, tr_f.shape[-1]), np.float32)
    v_m = np.zeros((e, n_val, n_pad), bool)
    v_l = np.zeros((e, n_val), np.int32)
    for i in range(e):
        vb = val_ds.make_batch(list(range(n_val)), rng, n_pad=n_pad,
                               train=False)
        v_f[i], v_m[i], v_l[i] = vb.features, vb.mask, vb.labels
    v_v = np.ones((e, n_val), np.float32)
    return tr_f, tr_m, tr_l, v_f, v_m, v_l, v_v


def _epoch_tensors(ds: BagDataset, order: np.ndarray, batch_size: int,
                   n_pad: int, rng: np.random.Generator):
    """Stack one epoch of batches into [S, B, N, D] host arrays."""
    order = order[: (len(order) // batch_size) * batch_size] if batch_size > 1 \
        else order
    steps = len(order) // batch_size
    feats = np.zeros((steps, batch_size, n_pad, ds._feat_dim), np.float32)
    mask = np.zeros((steps, batch_size, n_pad), bool)
    labels = np.zeros((steps, batch_size), np.int32)
    for s in range(steps):
        idxs = order[s * batch_size:(s + 1) * batch_size]
        b = ds.make_batch(idxs, rng, n_pad=n_pad, train=True)
        feats[s], mask[s], labels[s] = b.features, b.mask, b.labels
    return feats, mask, labels


def evaluate_split(fns: StepFns, params, ds: BagDataset, n_pad: int,
                   rng: np.random.Generator, batch_size: int = 32):
    """Deterministic forward over a split; bags subsampled to the training cap
    (the reference subsamples val/test bags identically,
    datasets/dataset_generic.py:517-519)."""
    n = len(ds)
    # don't pad a 10-slide split to batches of 32: shrink the batch to the
    # split (still ONE compiled shape per split size class)
    batch_size = min(batch_size, n)
    all_probs, all_nll = [], []
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        pad_to = batch_size  # keep a single compiled shape
        b = ds.make_batch(idxs, rng, n_pad=n_pad, train=False)
        fb = np.zeros((pad_to, n_pad, b.features.shape[2]), np.float32)
        mb = np.zeros((pad_to, n_pad), bool)
        lb = np.zeros((pad_to,), np.int32)
        fb[:len(idxs)], mb[:len(idxs)], lb[:len(idxs)] = (
            b.features, b.mask, b.labels)
        p, nll, _ = fns.eval_batch(params, jnp.asarray(fb), jnp.asarray(mb),
                                   jnp.asarray(lb))
        all_probs.append(np.asarray(p[:len(idxs)]))
        all_nll.append(np.asarray(nll[:len(idxs)]))
    probs = np.concatenate(all_probs)
    nll = np.concatenate(all_nll)
    return probs, float(nll.mean())


def train_fold(
    cfg: ExperimentConfig,
    fold: int,
    train_ds: BagDataset,
    val_ds: BagDataset,
    test_ds: BagDataset,
    class_counts: np.ndarray,
    *,
    feat_dim: Optional[int] = None,
    n_pad: Optional[int] = None,
    verbose: bool = True,
    log_cb: Optional[Callable[[int, Dict[str, float]], None]] = None,
    state_cb: Optional[Callable[[int, Any, Any], None]] = None,
) -> FoldResult:
    """Train one CV fold end-to-end (reference: train(), utils/core_utils.py:102-297)."""
    tc = cfg.train
    logger = None
    if cfg.log_data:
        # tensorboardX-or-JSONL scalars per epoch (reference: --log_data,
        # utils/core_utils.py:126-128, 365-371)
        from hipt_abmil_atec23_tpu.utils.logging import MetricsLogger
        logger = MetricsLogger(os.path.join(cfg.results_dir, str(fold)))
    if n_pad is None:
        n_pad = max(train_ds.pad_size(), val_ds.pad_size(), test_ds.pad_size())
    if feat_dim is None:
        feat_dim = train_ds._full_bag(train_ds.slide_ids[0]).shape[1]
    for ds in (train_ds, val_ds, test_ds):
        ds._feat_dim = feat_dim  # used by _epoch_tensors

    fns = build_step_fns(cfg, class_counts, n_pad, feat_dim)
    key = jax_key(tc.seed, fold)
    params = fns.init_params(key)
    results_dir = cfg.results_dir
    os.makedirs(results_dir, exist_ok=True)
    cpath = ckpt_path(results_dir, fold)
    if tc.continue_training and os.path.exists(cpath):
        params = load_params(cpath, params)
    opt_state = fns.tx.init(params)

    stopper = EarlyStopper(tc.min_epochs, tc.patience, tc.stop_epoch) \
        if tc.early_stopping else None
    rng = host_rng(tc.seed, fold)
    history: List[Dict[str, float]] = []
    stopped_epoch = tc.max_epochs - 1
    bs = max(1, cfg.bags.batch_size)

    chunk = max(1, getattr(tc, "epoch_chunk", 1))

    def _finish_epoch(epoch, rec, params_snapshot,
                      state_consistent: bool = True) -> bool:
        """Shared per-epoch bookkeeping; returns True to stop training."""
        history.append(rec)
        if state_cb is not None and state_consistent:
            # train-state hook (orbax trial checkpoints). Fires only where
            # params and opt_state belong to the same step: every epoch in
            # the per-epoch path, chunk boundaries in the epoch_chunk path
            # (the fused kernel snapshots params per epoch but optimizer
            # state only at the end).
            state_cb(epoch, params_snapshot, opt_state)
        if logger is not None:
            logger.scalars({k: v for k, v in rec.items() if k != "epoch"},
                           epoch)
        if log_cb and log_cb(epoch, rec):
            return True  # external stop (ASHA kill / plateau stopper)
        if verbose:
            print(f"[fold {fold}] epoch {epoch}: "
                  f"train_loss {rec['train_loss']:.4f} "
                  f"val_loss {rec['val_loss']:.4f} "
                  f"val_auc {rec['val_auc']:.4f}")
        if stopper is not None:
            if stopper.update(epoch, rec["val_loss"]):
                save_params(cpath, params_snapshot)
            if stopper.early_stop:
                if verbose:
                    print(f"[fold {fold}] early stop at epoch {epoch}")
                return True
        return False

    epoch = 0
    stop = False
    while epoch < tc.max_epochs and not stop:
        if chunk == 1:
            order = epoch_order(train_ds.labels, cfg.task.n_classes, rng,
                                tc.weighted_sample)
            feats, mask, labels = _epoch_tensors(train_ds, order, bs, n_pad,
                                                 rng)
            ekey = jax.random.fold_in(key, epoch + 1)
            params, opt_state, bl, inst, acc = fns.train_epoch(
                params, opt_state, jnp.asarray(feats), jnp.asarray(mask),
                jnp.asarray(labels), ekey)
            val_probs, val_loss = evaluate_split(fns, params, val_ds, n_pad,
                                                 rng)
            val_auc = M.auc_score(val_ds.labels, val_probs,
                                  cfg.task.n_classes)
            rec = dict(epoch=epoch, train_loss=float(bl),
                       train_inst_loss=float(inst), train_acc=float(acc),
                       val_loss=val_loss, val_auc=val_auc)
            stop = _finish_epoch(epoch, rec, params)
            stopped_epoch = epoch
            epoch += 1
        else:
            # E epochs per device dispatch: stack E epochs of train data and
            # E per-epoch val subsamples, run one fused call, then replay the
            # exact per-epoch early-stopping schedule from the returned
            # per-epoch parameter snapshots.
            e = min(chunk, tc.max_epochs - epoch)
            tr_f, tr_m, tr_l, v_f, v_m, v_l, v_v = _chunk_tensors(
                train_ds, val_ds, cfg, e, bs, n_pad, rng, tc)
            ekey = jax.random.fold_in(key, 100000 + epoch)
            params, opt_state, stacks = fns.train_epochs_chunk(
                params, opt_state, jnp.asarray(tr_f), jnp.asarray(tr_m),
                jnp.asarray(tr_l), jnp.asarray(v_f), jnp.asarray(v_m),
                jnp.asarray(v_l), jnp.asarray(v_v), ekey)
            p_stack, bls, insts, accs, probs, vlosses = stacks
            probs = np.asarray(probs)
            vlosses = np.asarray(vlosses)
            for i in range(e):
                n_val = len(val_ds)
                val_auc = M.auc_score(val_ds.labels, probs[i][:n_val],
                                      cfg.task.n_classes)
                rec = dict(epoch=epoch, train_loss=float(np.asarray(bls)[i]),
                           train_inst_loss=float(np.asarray(insts)[i]),
                           train_acc=float(np.asarray(accs)[i]),
                           val_loss=float(vlosses[i]), val_auc=val_auc)
                snap = jax.tree.map(lambda x, _i=i: x[_i], p_stack)
                stop = _finish_epoch(epoch, rec, snap,
                                     state_consistent=(i == e - 1))
                stopped_epoch = epoch
                epoch += 1
                if stop:
                    # a mid-chunk stop (early stop / ASHA kill) must leave
                    # the STOPPED epoch's params, not the end-of-chunk ones,
                    # so the post-loop save/eval matches the chunk=1 path
                    params = snap
                    break

    if stopper is not None and os.path.exists(cpath):
        params = load_params(cpath, params)  # reload best (reference :273-274)
    else:
        save_params(cpath, params)           # reference :276

    if logger is not None:
        logger.close()
    val_probs, val_loss = evaluate_split(fns, params, val_ds, n_pad, rng)
    test_probs, test_loss = evaluate_split(fns, params, test_ds, n_pad, rng)
    val_auc = M.auc_score(val_ds.labels, val_probs, cfg.task.n_classes)
    test_auc = M.auc_score(test_ds.labels, test_probs, cfg.task.n_classes)
    val_acc = M.accuracy(val_ds.labels, val_probs.argmax(1))
    test_acc = M.accuracy(test_ds.labels, test_probs.argmax(1))
    return FoldResult(
        fold=fold, val_auc=val_auc, test_auc=test_auc, val_acc=val_acc,
        test_acc=test_acc, val_loss=val_loss, test_loss=test_loss,
        stopped_epoch=stopped_epoch, test_probs=test_probs,
        test_labels=test_ds.labels, test_slide_ids=list(test_ds.slide_ids),
        history=history)
