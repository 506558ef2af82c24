"""Trial-parallel hyperparameter search: trials as a vmapped device axis.

The reference runs Ray Tune trials as separate processes sharing one GPU
(reference: main.py:40-255). Sequential trials re-dispatch the same tiny
training graph over and over; here trials whose ARCHITECTURE is identical
(same model size/dropout — only optimizer hyperparameters differ) train as
one vmapped program: lr and weight-decay are *traced values* carried in the
optimizer state, so a [T]-stacked axis of (params, moments, lr, reg) runs T
trials per device step and shards over the mesh like folds do.

Adam here is the reference's semantics (torch Adam with additive L2:
grad' = grad + reg*param, then moments — utils/utils.py:100-107), written
explicitly so lr/reg are plain array inputs. Verified against the optax
chain used by the sequential trainer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def adam_l2_update(params, grads, mu, nu, count, lr, reg):
    """One torch-style Adam step with additive L2; lr/reg are traced scalars."""
    count = count + 1
    def upd(p, g, m, v):
        g = g + reg * p
        m = ADAM_B1 * m + (1 - ADAM_B1) * g
        v = ADAM_B2 * v + (1 - ADAM_B2) * g * g
        mhat = m / (1 - ADAM_B1 ** count)
        vhat = v / (1 - ADAM_B2 ** count)
        return p - lr * mhat / (jnp.sqrt(vhat) + ADAM_EPS), m, v
    out = jax.tree.map(upd, params, grads, mu, nu)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, new_mu, new_nu, count


@dataclass
class ParallelTrialResult:
    lr: np.ndarray             # [T]
    reg: np.ndarray            # [T]
    val_loss: np.ndarray       # [T, E] (NaN after a trial's ASHA kill)
    best_trial: int
    best_lr: float
    best_reg: float
    stopped_epoch: Optional[np.ndarray] = None  # [T] last trained epoch


def run_trials_parallel(
    cfg,
    fold_datasets: Tuple,
    class_counts: np.ndarray,
    lr_values: np.ndarray,
    reg_values: np.ndarray,
    *,
    max_epochs: Optional[int] = None,
    mesh=None,
    verbose: bool = True,
    asha=None,
    n_real: Optional[int] = None,
) -> ParallelTrialResult:
    """Train T = len(lr_values) trials simultaneously on one fold.

    All trials share the data stream (same shuffled epochs — a controlled
    comparison) and differ only in (lr, reg). Selection: lowest mean val loss
    over the last min(10, E) epochs (reference: main.py:256-268).

    `asha` (an engine.tune.ASHAScheduler) applies per-trial kills at rung
    milestones: a killed trial's lane keeps computing (vmapped lanes are
    free) but its metrics freeze at NaN and it stops feeding the rungs.
    When every trial is dead the bucket stops early — that's where the
    wall-clock saving is. `n_real` ignores trailing mesh-padding trials.
    """
    from hipt_abmil_atec23_tpu.data.bags import epoch_order
    from hipt_abmil_atec23_tpu.engine.losses import make_bag_loss
    from hipt_abmil_atec23_tpu.engine.train import _epoch_tensors
    from hipt_abmil_atec23_tpu.models.abmil import build_mil_model
    from hipt_abmil_atec23_tpu.utils.seeding import host_rng, jax_key

    lr_values = np.asarray(lr_values, np.float32)
    reg_values = np.asarray(reg_values, np.float32)
    assert lr_values.shape == reg_values.shape
    n_trials = len(lr_values)
    train_ds, val_ds, _ = fold_datasets
    epochs = max_epochs or cfg.train.max_epochs
    bs = max(1, cfg.bags.batch_size)

    feat_dim = train_ds._full_bag(train_ds.slide_ids[0]).shape[1]
    for ds in (train_ds, val_ds):
        ds._feat_dim = feat_dim
    n_pad = max(train_ds.pad_size(), val_ds.pad_size())

    model = build_mil_model(
        cfg.model.model_type, size_arg=cfg.model.model_size,
        dropout=cfg.model.drop_out, n_classes=cfg.task.n_classes,
        k_sample=cfg.model.k_sample, subtyping=cfg.model.subtyping)
    is_clam = cfg.model.model_type in ("clam_sb", "clam_mb")
    use_inst = is_clam and not cfg.model.no_inst_cluster
    bag_loss = make_bag_loss(cfg.train.bag_loss, class_counts)
    bag_weight = cfg.train.bag_weight

    def fwd(params, bag, mask, label, rng, deterministic):
        kwargs = dict(deterministic=deterministic)
        if is_clam:
            kwargs.update(label=label, instance_eval=use_inst)
        rngs = None if deterministic else {"dropout": rng}
        return model.apply(params, bag, mask, rngs=rngs, **kwargs)

    def loss_fn(params, feats, mask, labels, rng):
        rngs = jax.random.split(rng, feats.shape[0])
        out = jax.vmap(lambda b, m, l, r: fwd(params, b, m, l, r, False))(
            feats, mask, labels, rngs)
        bl = bag_loss(out.logits[:, 0, :], labels)
        if use_inst:
            return bag_weight * bl + (1 - bag_weight) * jnp.mean(
                out.extras["instance_loss"])
        return bl

    grad_fn = jax.grad(loss_fn)

    def trial_epoch(params, mu, nu, count, lr, reg, feats, mask, labels, key):
        """One trial's epoch: scan over steps with traced lr/reg."""
        def step(carry, batch):
            params, mu, nu, count = carry
            f, m, l, k = batch
            g = grad_fn(params, f, m, l, k)
            params, mu, nu, count = adam_l2_update(params, g, mu, nu, count,
                                                   lr, reg)
            return (params, mu, nu, count), None
        keys = jax.random.split(key, feats.shape[0])
        (params, mu, nu, count), _ = jax.lax.scan(
            step, (params, mu, nu, count), (feats, mask, labels, keys))
        return params, mu, nu, count

    def val_loss_fn(params, feats, mask, labels, valid):
        out = jax.vmap(lambda b, m: model.apply(params, b, m))(feats, mask)
        logp = jax.nn.log_softmax(out.logits[:, 0, :], axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    # [T]-stacked state; trials shard over the mesh when provided
    key = jax_key(cfg.train.seed, 4242)
    params0 = [model.init(jax.random.fold_in(key, t),
                          jnp.zeros((n_pad, feat_dim), jnp.float32),
                          jnp.ones((n_pad,), bool),
                          **(dict(label=jnp.array(0), instance_eval=True)
                             if is_clam else {}))
               for t in range(n_trials)]
    params = jax.tree.map(lambda *xs: jnp.stack(xs), *params0)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    count = jnp.zeros((n_trials,), jnp.int32)
    lr = jnp.asarray(lr_values)
    reg = jnp.asarray(reg_values)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ax = list(mesh.shape)[0]
        shard = lambda x: jax.device_put(
            x, NamedSharding(mesh, P(ax, *([None] * (x.ndim - 1)))))
        params = jax.tree.map(shard, params)
        mu = jax.tree.map(shard, mu)
        nu = jax.tree.map(shard, nu)

    epoch_f = jax.jit(jax.vmap(trial_epoch,
                               in_axes=(0, 0, 0, 0, 0, 0, None, None, None, 0)))
    val_f = jax.jit(jax.vmap(val_loss_fn,
                             in_axes=(0, None, None, None, None)))

    rng = host_rng(cfg.train.seed, 999)
    vb = val_ds.make_batch(list(range(len(val_ds))), rng, n_pad=n_pad,
                           train=False)
    v_feats, v_mask = jnp.asarray(vb.features), jnp.asarray(vb.mask)
    v_labels = jnp.asarray(vb.labels)
    v_valid = jnp.ones((len(val_ds),), jnp.float32)

    n_real = n_trials if n_real is None else n_real
    val_hist = np.full((n_trials, epochs), np.nan, np.float32)
    active = np.zeros((n_trials,), bool)
    active[:n_real] = True
    stopped = np.full((n_trials,), epochs - 1, np.int64)
    for epoch in range(epochs):
        order = epoch_order(train_ds.labels, cfg.task.n_classes, rng,
                            cfg.train.weighted_sample)
        feats, mask, labels = _epoch_tensors(train_ds, order, bs, n_pad, rng)
        ekeys = jnp.stack([jax.random.fold_in(key, epoch * n_trials + t)
                           for t in range(n_trials)])
        params, mu, nu, count = epoch_f(
            params, mu, nu, count, lr, reg,
            jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(labels), ekeys)
        vl = np.asarray(val_f(params, v_feats, v_mask, v_labels, v_valid))
        val_hist[active, epoch] = vl[active]
        if asha is not None:
            for t in np.flatnonzero(active):
                if asha.should_stop(epoch, float(vl[t])):
                    active[t] = False
                    stopped[t] = epoch
            if not active.any():
                if verbose:
                    print(f"[trials] all trials ASHA-killed at epoch {epoch}")
                break
        if verbose:
            print(f"[trials] epoch {epoch}: val_loss "
                  f"{np.array2string(vl[:n_real], precision=4)}")

    def _last10(t):
        vals = val_hist[t][~np.isnan(val_hist[t])]
        return float(vals[-min(10, len(vals)):].mean()) if len(vals) \
            else float("inf")
    last = np.array([_last10(t) for t in range(n_real)])
    best = int(np.argmin(last))
    return ParallelTrialResult(
        lr=lr_values, reg=reg_values, val_loss=val_hist, best_trial=best,
        best_lr=float(lr_values[best]), best_reg=float(reg_values[best]),
        stopped_epoch=stopped)


# --------------------------------------------------------------------------
# Heterogeneous trial parallelism: bucket by traced-compatible shape
# --------------------------------------------------------------------------

_TRACED_KEYS = ("lr", "reg")  # tunables that vmap as traced values


def _bucket_key(trial: Dict) -> Tuple:
    """Static (shape-affecting) part of a trial config: model_size /
    max_patches_per_slide / B / drop_out force a recompile, lr/reg do not."""
    return tuple(sorted((k, v) for k, v in trial.items()
                        if k not in _TRACED_KEYS))


def run_tuning_hetero(
    base_cfg,
    manifest,
    store,
    class_counts: np.ndarray,
    *,
    fold: int = 0,
    space: Optional[Dict] = None,
    num_samples: int = 20,
    max_epochs: Optional[int] = None,
    grace_period: int = 8,
    reduction_factor: int = 2,
    mesh=None,
    seed: int = 0,
    output_csv: Optional[str] = None,
    verbose: bool = True,
):
    """Trial-parallel search over a HETEROGENEOUS space (VERDICT r1 #7).

    The reference's real grids sweep model_size / max_patches / drop_out
    alongside lr and reg (reference: main.py:54-206); those axes change
    traced shapes or static module attributes, so one vmap can't span them.
    Sampled configs bucket by their static part (_bucket_key); each bucket
    trains as ONE vmapped program with per-trial (lr, reg) traced in the
    optimizer state, its trial axis sharded over the mesh (padded by
    repeating the last config when the bucket doesn't divide the mesh); the
    shared ASHAScheduler kills trials per-rung ACROSS buckets, and a bucket
    whose trials are all dead stops early.

    Returns (best_config, results_df) matching run_tuning's selection rule
    (lowest last-10-epoch mean val loss, reference: main.py:256-268).
    """
    import pandas as pd
    from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets
    from hipt_abmil_atec23_tpu.engine.tune import (
        ASHAScheduler, apply_trial_config, sample_configs,
        DEFAULT_SEARCH_SPACE)

    space = space or DEFAULT_SEARCH_SPACE
    configs = sample_configs(space, num_samples, seed)
    max_t = max_epochs or base_cfg.train.max_epochs
    asha = ASHAScheduler(max_t=max_t, grace_period=grace_period,
                         reduction_factor=reduction_factor)
    ndev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1

    buckets: Dict[Tuple, List[int]] = {}
    for i, c in enumerate(configs):
        buckets.setdefault(_bucket_key(c), []).append(i)

    rows = [None] * len(configs)
    for bkey, idxs in buckets.items():
        static = dict(bkey)
        cfg = apply_trial_config(base_cfg, static)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, max_epochs=max_t,
                                                 early_stopping=False))
        datasets = make_fold_datasets(manifest, store, cfg, fold)
        lrs = [float(configs[i].get("lr", base_cfg.train.lr)) for i in idxs]
        regs = [float(configs[i].get("reg", base_cfg.train.reg)) for i in idxs]
        n_real = len(idxs)
        if mesh is not None and n_real % ndev:
            pad = ndev - n_real % ndev
            lrs += [lrs[-1]] * pad
            regs += [regs[-1]] * pad
        if verbose:
            print(f"[tune-hetero] bucket {static}: {n_real} trials"
                  f"{' (+%d pad)' % (len(lrs) - n_real) if len(lrs) > n_real else ''}")
        res = run_trials_parallel(
            cfg, datasets, class_counts, np.asarray(lrs, np.float32),
            np.asarray(regs, np.float32), max_epochs=max_t, mesh=mesh,
            verbose=verbose, asha=asha, n_real=n_real)
        for j, i in enumerate(idxs):
            vals = res.val_loss[j][~np.isnan(res.val_loss[j])]
            rows[i] = {**configs[i],
                       "epochs": int(len(vals)),
                       "best_val_loss": float(vals.min()),
                       "last10_val_loss": float(
                           vals[-min(10, len(vals)):].mean()),
                       "stopped_epoch": int(res.stopped_epoch[j])}
    df = pd.DataFrame(rows)
    if output_csv:
        df.to_csv(output_csv, index=False)
    best = configs[int(np.argmin(df["last10_val_loss"].values))]
    return best, df
