"""Exact FULL-BAG MIL training with the instance axis sharded over the mesh.

The reference must subsample bags to ``max_patches_per_slide`` to fit a
training step (reference: datasets/dataset_generic.py:517-519; tuned to 75
for HIPT, 6000 for ResNet — docs/README.md). Here the bag axis is a mesh
axis: every slide trains on ALL of its instances, sharded over ICI, with
gradients flowing through the sequence-parallel collectives
(parallel/sharded_bag.py). One compiled step serves every slide — bags pad
to one bucket size and validity is a mask.

This is a deliberately separate trainer from engine/train.py's stacked
[S, B, N, D] scan: full bags (10^4-10^5 x D) cannot stack per epoch, so the
loop streams one slide per optimizer step (the reference's own schedule)
while the step itself is jitted and mesh-sharded.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hipt_abmil_atec23_tpu.parallel.sharded_bag import (
    sharded_clam_forward, sharded_clam_loss)


def _pad_bucket(n_max: int, n_devices: int) -> int:
    m = 128 * n_devices
    return ((n_max + m - 1) // m) * m


def train_full_bags_sharded(
    cfg,
    train_ds,
    val_ds,
    mesh,
    *,
    axis: str = "inst",
    verbose: bool = True,
) -> Tuple[dict, List[dict]]:
    """Train CLAM_SB on exact full bags, instance axis sharded over `mesh`.

    Uses cfg.model (must be single-branch gated CLAM — the sequence-parallel
    forward's contract), cfg.train.{lr,reg,max_epochs,seed}. Returns
    (params, history) where history rows carry train_loss/val_loss/val_auc.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hipt_abmil_atec23_tpu.engine import metrics as M
    from hipt_abmil_atec23_tpu.engine.train import make_optimizer
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.utils.seeding import host_rng

    if cfg.model.model_type != "clam_sb" or not cfg.model.gate:
        raise ValueError("full-bag sharded training requires single-branch "
                         "gated CLAM (clam_sb)")
    n_devices = int(np.prod(list(mesh.shape.values())))
    feat_dim = train_ds._full_bag(train_ds.slide_ids[0]).shape[1]
    n_max = max(len(ds._full_bag(s)) for ds in (train_ds, val_ds)
                for s in ds.slide_ids)
    n_pad = _pad_bucket(n_max, n_devices)

    model = build_mil_model("clam_sb", size_arg=cfg.model.model_size,
                            n_classes=cfg.task.n_classes, gate=True)
    params = model.init(jax.random.PRNGKey(cfg.train.seed),
                        jnp.zeros((n_pad, feat_dim), jnp.float32), None)
    tx = make_optimizer(cfg.train.opt, cfg.train.lr, cfg.train.reg)
    opt_state = tx.init(params)
    bag_sharding = NamedSharding(mesh, P(axis, None))
    mask_sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def step(params, opt_state, bag, mask, label):
        loss, grads = jax.value_and_grad(sharded_clam_loss)(
            params, bag, mask, label, mesh, axis=axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def infer(params, bag, mask):
        logits, _ = sharded_clam_forward(params, bag, mask, mesh, axis=axis)
        return jax.nn.softmax(logits[0])

    def _padded(ds, sid):
        feats = ds._full_bag(sid)
        k = min(len(feats), n_pad)
        bag = np.zeros((n_pad, feat_dim), np.float32)
        bag[:k] = feats[:k]
        mask = np.arange(n_pad) < k
        return (jax.device_put(jnp.asarray(bag), bag_sharding),
                jax.device_put(jnp.asarray(mask), mask_sharding))

    rng = host_rng(cfg.train.seed, 7)
    history: List[dict] = []
    for epoch in range(cfg.train.max_epochs):
        order = rng.permutation(len(train_ds.slide_ids))
        losses = []
        for i in order:
            sid = train_ds.slide_ids[i]
            bag, mask = _padded(train_ds, sid)
            params, opt_state, loss = step(
                params, opt_state, bag, mask,
                jnp.asarray(int(train_ds.labels[i])))
            losses.append(float(loss))
        val_probs = np.stack([
            np.asarray(infer(params, *_padded(val_ds, s)))
            for s in val_ds.slide_ids])
        val_auc = M.auc_score(val_ds.labels, val_probs, cfg.task.n_classes)
        val_loss = float(np.mean(
            [-np.log(max(val_probs[j, int(l)], 1e-12))
             for j, l in enumerate(val_ds.labels)]))
        rec = dict(epoch=epoch, train_loss=float(np.mean(losses)),
                   val_loss=val_loss, val_auc=val_auc)
        history.append(rec)
        if verbose:
            print(f"[full-bag] epoch {epoch}: train {rec['train_loss']:.4f} "
                  f"val {val_loss:.4f} auc {val_auc:.4f} "
                  f"(bags padded to {n_pad})")
    return params, history
