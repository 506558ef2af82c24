"""DRAS-MIL: attention-guided active patch sampling.

Capability parity with the reference's sampling subsystem (reference:
utils/sampling_utils.py, utils/core_utils_sampling.py): approximate
full-slide inference/training by iteratively sampling patches, scoring them
with the MIL attention head, propagating scores to spatial/textural
neighbors, and resampling from the updated weights.

TPU redesign:
- neighbor search is a brute-force distance matrix on device (an einsum —
  bags are <= ~10^4 instances, so exact kNN on the MXU beats a ball tree;
  reference: sklearn NearestNeighbors at core_utils_sampling.py:408);
- weight propagation is a vectorized scatter (np.maximum.at / bincount)
  instead of the reference's nested Python loops
  (sampling_utils.py:66-187);
- the attention forward over a sampled subset is one jitted call.
"""
from __future__ import annotations

import functools

import math
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

SAMPLING_UPDATES = ("max", "average", "newest", "none")


@dataclass
class SamplingConfig:
    """Flags mirror the reference CLI (reference: main.py:359-371)."""
    sampling_type: str = "spatial"       # spatial | textural
    texture_model: str = "levit_128s"    # resnet50 | levit_128s
    samples_per_iteration: int = 100
    resampling_iterations: int = 10
    sampling_random: float = 0.2
    sampling_random_delta: float = 0.02
    sampling_neighbors: int = 20
    final_sample_size: int = 100
    weight_smoothing: float = 0.15       # 'power'
    sampling_update: str = "max"
    no_sampling_epochs: int = 20
    fully_random: bool = False
    grid_initial_sample: bool = False
    sampling_average: bool = False
    device_loop: bool = False            # one-lax.scan DRAS (see below)

    def __post_init__(self):
        # reference parity: --sampling_average overrides the update mode to
        # 'average' (core_utils_sampling.py:314-317, eval_utils.py:197)
        if self.sampling_average:
            self.sampling_update = "average"


def generate_sample_idxs(n: int, previous: Sequence[int],
                         weights: Optional[np.ndarray],
                         samples_per_iteration: int, num_random: int,
                         rng: np.random.Generator,
                         grid: bool = False,
                         coords: Optional[np.ndarray] = None) -> List[int]:
    """Weighted + epsilon-random sample, optionally grid-stratified initial
    sample (reference: generate_sample_idxs, sampling_utils.py:11-48)."""
    if grid:
        assert coords is not None and len(coords) > 0
        splits = int(math.sqrt(samples_per_iteration))
        xs, ys = coords[:, 0], coords[:, 1]
        xb = np.linspace(xs.min(), xs.max() + 1e-5, splits + 1)
        yb = np.linspace(ys.min(), ys.max() + 1e-5, splits + 1)
        cell = (np.searchsorted(xb, xs, side="right") - 1) * (splits + 1) + \
            (np.searchsorted(yb, ys, side="right") - 1)
        idxs: List[int] = []
        for c in np.unique(cell):
            members = np.flatnonzero(cell == c)
            idxs.append(int(rng.choice(members)))
        if len(idxs) < samples_per_iteration:
            extra = rng.choice(n, samples_per_iteration - len(idxs),
                               replace=False)
            idxs.extend(int(e) for e in extra)
        return idxs[:samples_per_iteration]

    nonrandom: List[int] = []
    n_weighted = int(samples_per_iteration - num_random)
    if n_weighted > 0:
        # no-repeat zeroing can exhaust the weighted pool on small bags
        # (weights stay unnormalized between iterations, so the sum can hit
        # exactly 0); cap at the drawable entries, top-up happens below
        s = weights.sum()
        drawable = int(np.count_nonzero(weights)) if s > 0 else 0
        k_w = min(n_weighted, drawable)
        if k_w > 0:
            nonrandom = list(rng.choice(n, size=k_w, replace=False,
                                        p=weights / s))
        num_random += n_weighted - k_w
    if num_random > 0:
        available = np.setdiff1d(np.arange(n),
                                 np.asarray(list(previous) + nonrandom,
                                            dtype=int))
        k = min(num_random, len(available))
        return list(rng.choice(available, k, replace=False)) + nonrandom
    return nonrandom


def update_sampling_weights(weights: np.ndarray, attention: np.ndarray,
                            all_sample_idxs: Sequence[int],
                            neighbor_idxs: np.ndarray, neighbors: int,
                            power: float = 0.15, normalise: bool = True,
                            sampling_update: str = "max",
                            repeats_allowed: bool = False) -> np.ndarray:
    """Propagate attention to k nearest neighbors and fold into the weights
    (reference: update_sampling_weights, sampling_utils.py:66-187), as
    vectorized scatters."""
    assert sampling_update in SAMPLING_UPDATES
    weights = np.asarray(weights, np.float64).copy()
    if sampling_update != "none":
        nbr = np.asarray(neighbor_idxs)[:, :neighbors]       # [S, k]
        flat = nbr.ravel()
        rep = np.repeat(np.asarray(attention, np.float64), nbr.shape[1])
        new = np.zeros(len(weights))
        if sampling_update == "max":
            np.maximum.at(new, flat, rep)
            new = np.power(new, power)
            weights = np.maximum(weights, new)
        elif sampling_update == "average":
            # The reference computes an order-dependent running pairwise
            # average new=(prev+attn)/2 in visit order, not an arithmetic
            # mean (sampling_utils.py:76-83); replicate the recurrence so
            # --sampling_average runs reproduce reference weights. S*k is
            # small (samples/iter x neighbors), so the host loop is cheap.
            attn64 = np.asarray(attention, np.float64)
            for i in range(nbr.shape[0]):
                for index in nbr[i]:
                    if new[index] > 0:
                        new[index] = (new[index] + attn64[i]) / 2
                    else:
                        new[index] = attn64[i]
            touched = new > 0
            new = np.power(new, power)
            weights[touched] = new[touched]
        elif sampling_update == "newest":
            new[flat] = rep  # last write wins, like the reference loop order
            touched = np.zeros(len(weights), bool)
            touched[flat] = True
            weights[touched] = np.power(new[touched], power)
    if not repeats_allowed and len(all_sample_idxs):
        weights[np.asarray(list(all_sample_idxs), int)] = 0.0
    if normalise:
        s = weights.sum()
        if s > 0:
            weights = weights / s
        else:
            weights = np.full_like(weights, 1.0 / len(weights))
    return weights


def knn_indices(X: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Exact kNN of `queries` among all rows of X — one device einsum + top_k
    (replaces ball_tree, reference: core_utils_sampling.py:408)."""
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(X, jnp.float32)
    q = jnp.asarray(queries, jnp.float32)
    d2 = (jnp.sum(q * q, 1)[:, None] - 2.0 * q @ x.T + jnp.sum(x * x, 1)[None])
    _, idx = jax.lax.top_k(-d2, k)
    return np.asarray(idx)


@dataclass
class DrasResult:
    final_idxs: np.ndarray
    weights: np.ndarray
    all_sampled: List[int]
    logits_history: List[np.ndarray] = field(default_factory=list)

    @property
    def bag_idxs(self) -> np.ndarray:
        """The bag actually trained/classified on: the final weighted draw
        PLUS every patch sampled along the way (reference --use_all_samples,
        its only implemented path: core_utils_sampling.py:449-454,
        eval_utils.py:462-465). The final draw alone would systematically
        exclude every high-attention patch the loop already found, because
        sampled indices are zero-weighted."""
        return np.concatenate([np.asarray(self.final_idxs, int),
                               np.asarray(self.all_sampled, int)])


def dras_sample_slide(
    features,                      # [N, D] full bag, or any lazy source
    coords: np.ndarray,            # [N, 2]
    attention_fn: Callable[[np.ndarray], np.ndarray],  # subset -> [n] scores
    cfg: SamplingConfig,
    rng: np.random.Generator,
    texture_features: Optional[np.ndarray] = None,
) -> DrasResult:
    """The per-slide DRAS loop (reference: core_utils_sampling.py:302-512 /
    eval_utils.py summary_sampling): initial (grid or random) sample ->
    attention -> kNN propagate -> weighted+epsilon-random resample, for
    `resampling_iterations`; returns the final weighted sample.

    `features` only needs ``len()`` and ``take(idxs, axis=0)`` — an ndarray
    works, and so does a lazy source like OnlineFeatureGather that encodes
    only the patches actually sampled (reference: --eval_features on-the-fly
    extraction, eval_utils.py:231-260).
    """
    n = len(features)
    if cfg.fully_random or n <= cfg.final_sample_size:
        k = min(cfg.final_sample_size, n)
        return DrasResult(final_idxs=rng.choice(n, k, replace=False),
                          weights=np.full(n, 1.0 / n), all_sampled=[])

    if cfg.sampling_type == "spatial":
        X = np.asarray(coords, np.float32)
    elif texture_features is not None:
        X = np.asarray(texture_features, np.float32)
    elif isinstance(features, np.ndarray):
        X = np.asarray(features, np.float32)
    else:
        raise ValueError("textural sampling over a lazy feature source "
                         "requires texture_features")

    # reference floor: weights start at the constant 1e-4, NOT 1/n
    # (core_utils_sampling.py:420); weights stay unnormalized between
    # iterations, so the attention**power-vs-floor comparison depends on the
    # absolute fill value whenever n != 10^4.
    weights = np.full(n, 1e-4)
    all_sampled: List[int] = []
    spi = min(cfg.samples_per_iteration, n)
    idxs = generate_sample_idxs(
        n, [], weights, spi, num_random=spi, rng=rng,
        grid=cfg.grid_initial_sample, coords=coords)
    sampling_random = cfg.sampling_random
    neighbors = min(cfg.sampling_neighbors, n)

    for it in range(cfg.resampling_iterations):
        all_sampled.extend(int(i) for i in idxs)
        # dtype=int: an exhausted draw returns [], which np.asarray types
        # as float64 and take() refuses
        sel = np.asarray(idxs, dtype=int)
        attn = np.asarray(attention_fn(features.take(sel, axis=0)))
        nbrs = knn_indices(X, X[sel], neighbors)
        # normalise=False like every reference loop call site
        # (core_utils_sampling.py:429,446, eval_utils.py:404,460):
        # normalizing between iterations would collapse historical 'max'
        # weights relative to fresh attention**power values; draws normalize
        # transiently instead.
        weights = update_sampling_weights(
            weights, attn, all_sampled, nbrs, neighbors,
            power=cfg.weight_smoothing, normalise=False,
            sampling_update=cfg.sampling_update)
        sampling_random = max(0.0, sampling_random - cfg.sampling_random_delta)
        num_random = int(spi * sampling_random)
        if it < cfg.resampling_iterations - 1:
            idxs = generate_sample_idxs(n, all_sampled, weights, spi,
                                        num_random, rng)

    k = min(cfg.final_sample_size, n)
    s = weights.sum()
    if s > 0:
        p = weights / s
    else:
        # degenerate: every patch already sampled and zero-weighted (tiny
        # slides); fall back to uniform — the bag is the union anyway
        p = np.full(n, 1.0 / n)
    nz = int((p > 0).sum())
    final = rng.choice(n, min(k, nz), replace=False, p=p)
    return DrasResult(final_idxs=final, weights=weights,
                      all_sampled=all_sampled)


# ---------------------------------------------------------------------------
# DRAS training / evaluation (reference: utils/core_utils_sampling.py:106-671,
# utils/eval_utils.py summary_sampling :180-566)
# ---------------------------------------------------------------------------

def make_attention_fn(model, subset_size: int):
    """Jitted attention-only forward at a fixed subset shape; ragged subsets
    are padded+masked."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _attn(params, bag, mask):
        a = model.apply(params, bag, mask, attention_only=True)  # [1, n]
        # masked softmax over the sampled subset -> probabilities the weight
        # update can smooth with `power`
        from hipt_abmil_atec23_tpu.ops.masking import masked_softmax
        return masked_softmax(a, mask[None, :], axis=-1)[0]

    def attention_fn(params, subset: np.ndarray) -> np.ndarray:
        n = len(subset)
        bag = np.zeros((subset_size, subset.shape[1]), np.float32)
        msk = np.zeros((subset_size,), bool)
        bag[:n], msk[:n] = subset, True
        out = np.asarray(_attn(params, jnp.asarray(bag), jnp.asarray(msk)))
        return out[:n]

    return attention_fn


def train_fold_sampling(cfg, scfg: SamplingConfig, fold, train_ds, val_ds,
                        test_ds, class_counts, *, coords_lookup,
                        texture_lookup=None, verbose: bool = True):
    """Train one fold with DRAS active sampling after `no_sampling_epochs`
    full-bag epochs (reference: train_sampling, core_utils_sampling.py:106-299).

    coords_lookup: slide_id -> [N, 2] patch coords (spatial features).
    texture_lookup: slide_id -> [N, Dt] texture features (textural mode).
    """
    import dataclasses
    import os
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine import metrics as M
    from hipt_abmil_atec23_tpu.engine.checkpoint import ckpt_path, save_params, load_params
    from hipt_abmil_atec23_tpu.engine.train import (
        EarlyStopper, build_step_fns, evaluate_split, FoldResult)
    from hipt_abmil_atec23_tpu.utils.seeding import host_rng, jax_key

    tc = cfg.train
    feat_dim = train_ds._full_bag(train_ds.slide_ids[0]).shape[1]
    for ds in (train_ds, val_ds, test_ds):
        ds._feat_dim = feat_dim
    n_pad = max(train_ds.pad_size(), val_ds.pad_size(), test_ds.pad_size())
    fns = build_step_fns(cfg, class_counts, n_pad, feat_dim)
    from hipt_abmil_atec23_tpu.models.abmil import build_mil_model
    model = build_mil_model(cfg.model.model_type, size_arg=cfg.model.model_size,
                            dropout=cfg.model.drop_out,
                            n_classes=cfg.task.n_classes,
                            k_sample=cfg.model.k_sample,
                            subtyping=cfg.model.subtyping)
    attention_fn = make_attention_fn(model, scfg.samples_per_iteration)

    key = jax_key(tc.seed, fold)
    params = fns.init_params(key)
    opt_state = fns.tx.init(params)
    rng = host_rng(tc.seed, fold)
    stopper = EarlyStopper(tc.min_epochs, tc.patience, tc.stop_epoch) \
        if tc.early_stopping else None
    cpath = ckpt_path(cfg.results_dir, fold)
    os.makedirs(cfg.results_dir, exist_ok=True)

    from hipt_abmil_atec23_tpu.data.bags import epoch_order
    from hipt_abmil_atec23_tpu.engine.train import _epoch_tensors
    history = []
    n_final = _bag_cap(scfg)

    for epoch in range(tc.max_epochs):
        order = epoch_order(train_ds.labels, cfg.task.n_classes, rng,
                            tc.weighted_sample)
        if epoch < scfg.no_sampling_epochs:
            feats, mask, labels = _epoch_tensors(train_ds, order, 1, n_pad, rng)
            params, opt_state, bl, _, _ = fns.train_epoch(
                params, opt_state, jnp.asarray(feats), jnp.asarray(mask),
                jnp.asarray(labels), jax.random.fold_in(key, epoch + 1))
            train_loss = float(bl)
        else:
            # DRAS epoch: per slide, sample with the current model then take
            # one optimizer step on the final sample
            losses = []
            for si, idx in enumerate(order):
                sid = train_ds.slide_ids[idx]
                full = train_ds._full_bag(sid)
                if scfg.device_loop:
                    res = dras_sample_slide_device(
                        jnp.asarray(full), coords_lookup[sid], params, model,
                        scfg,
                        jax.random.fold_in(key, (epoch + 1) * 7919 + si),
                        texture_features=(texture_lookup or {}).get(sid))
                else:
                    res = dras_sample_slide(
                        full, coords_lookup[sid],
                        lambda sub: attention_fn(params, sub), scfg, rng,
                        texture_features=(texture_lookup or {}).get(sid))
                sub = full[res.bag_idxs]
                fb = np.zeros((1, 1, n_final, feat_dim), np.float32)
                mb = np.zeros((1, 1, n_final), bool)
                fb[0, 0, :len(sub)], mb[0, 0, :len(sub)] = sub, True
                lb = np.full((1, 1), train_ds.labels[idx], np.int32)
                params, opt_state, bl, _, _ = fns.train_epoch(
                    params, opt_state, jnp.asarray(fb), jnp.asarray(mb),
                    jnp.asarray(lb),
                    jax.random.fold_in(key, (epoch + 1) * 100000 + si))
                losses.append(float(bl))
            train_loss = float(np.mean(losses))

        val_probs, val_loss = evaluate_split(fns, params, val_ds, n_pad, rng)
        val_auc = M.auc_score(val_ds.labels, val_probs, cfg.task.n_classes)
        history.append(dict(epoch=epoch, train_loss=train_loss,
                            val_loss=val_loss, val_auc=val_auc))
        if verbose:
            print(f"[dras fold {fold}] epoch {epoch} "
                  f"{'full' if epoch < scfg.no_sampling_epochs else 'sampled'}"
                  f": train {train_loss:.4f} val {val_loss:.4f} "
                  f"auc {val_auc:.4f}")
        if stopper is not None:
            if stopper.update(epoch, val_loss):
                save_params(cpath, params)
            if stopper.early_stop:
                break

    if stopper is not None and os.path.exists(cpath):
        params = load_params(cpath, params)
    else:
        save_params(cpath, params)

    val_probs, val_loss = evaluate_split(fns, params, val_ds, n_pad, rng)
    test_probs, test_loss = evaluate_split(fns, params, test_ds, n_pad, rng)
    return FoldResult(
        fold=fold,
        val_auc=M.auc_score(val_ds.labels, val_probs, cfg.task.n_classes),
        test_auc=M.auc_score(test_ds.labels, test_probs, cfg.task.n_classes),
        val_acc=M.accuracy(val_ds.labels, val_probs.argmax(1)),
        test_acc=M.accuracy(test_ds.labels, test_probs.argmax(1)),
        val_loss=val_loss, test_loss=test_loss,
        stopped_epoch=len(history) - 1, test_probs=test_probs,
        test_labels=test_ds.labels, test_slide_ids=list(test_ds.slide_ids),
        history=history)


def eval_sampling(cfg, scfg: SamplingConfig, ds, params, model, *,
                  coords_lookup, texture_lookup=None, seed: int = 0,
                  feature_lookup=None, device_loop: bool = False):
    """Sampling-based inference (reference: summary_sampling,
    eval_utils.py:180-566): per slide, DRAS-select a final sample and
    classify it; returns per-slide probs + per-iteration tracking.

    ``feature_lookup`` (slide_id -> lazy feature source with take/len)
    replaces precomputed bags with on-the-fly encoding of only the sampled
    patches (reference: --eval_features, eval_utils.py:231-260)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    attention_fn = make_attention_fn(model, scfg.samples_per_iteration)
    n_final = _bag_cap(scfg)
    if feature_lookup is not None:
        feat_dim = feature_lookup[ds.slide_ids[0]].shape[1]
    else:
        feat_dim = ds._full_bag(ds.slide_ids[0]).shape[1]

    @jax.jit
    def _fwd(p, bag, mask):
        out = model.apply(p, bag, mask)
        return out.logits

    probs = np.zeros((len(ds), cfg.task.n_classes), np.float32)
    sampled_counts = np.zeros(len(ds), np.int64)
    for i, sid in enumerate(ds.slide_ids):
        full = feature_lookup[sid] if feature_lookup is not None \
            else ds._full_bag(sid)
        if device_loop and feature_lookup is None:
            # one lax.scan dispatch for the whole loop (21x on the tunnel
            # chip); host loop keeps exact reference RNG semantics
            res = dras_sample_slide_device(
                jnp.asarray(full), coords_lookup[sid], params, model, scfg,
                jax.random.fold_in(jax.random.PRNGKey(seed), i),
                texture_features=(texture_lookup or {}).get(sid))
        else:
            res = dras_sample_slide(
                full, coords_lookup[sid],
                lambda sub: attention_fn(params, sub), scfg, rng,
                texture_features=(texture_lookup or {}).get(sid))
        sub = full.take(res.bag_idxs, axis=0)
        bag = np.zeros((n_final, feat_dim), np.float32)
        mask = np.zeros((n_final,), bool)
        bag[:len(sub)], mask[:len(sub)] = sub, True
        logits = np.asarray(_fwd(params, jnp.asarray(bag), jnp.asarray(mask)))
        e = np.exp(logits[0] - logits[0].max())
        probs[i] = e / e.sum()
        sampled_counts[i] = len(set(res.all_sampled)) + len(res.final_idxs)
    return probs, sampled_counts


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _bag_cap(scfg: SamplingConfig) -> int:
    """Static pad for the DRAS bag: final draw + everything sampled along
    the way (all_sampled <= iterations x samples_per_iteration)."""
    return _round8(scfg.final_sample_size
                   + scfg.resampling_iterations * scfg.samples_per_iteration)


# ---------------------------------------------------------------------------
# Fully on-device DRAS: the whole resampling loop as ONE lax.scan dispatch
# (SURVEY.md §7 hard-parts plan: "express as lax.scan with fixed iteration
# counts"). The host variant above keeps exact reference RNG semantics; this
# variant trades bitwise parity for a single device program — weights, kNN,
# attention and the draws all stay in HBM, so a 10-iteration DRAS pass costs
# one dispatch instead of 10 round trips (~200ms each through a tunnel).
# Divergence (documented): the reference's split draw (num_random uniform +
# rest weighted, jointly without replacement) becomes a Gumbel-top-k draw
# over the per-iteration MIXTURE distribution — statistically equivalent
# epsilon-greedy exploration, different bits.
# ---------------------------------------------------------------------------

def dras_sample_slide_device(
    features,                     # [N, D] jnp array (device-resident)
    coords,                       # [N, 2]
    params,
    model,
    cfg: SamplingConfig,
    key,
    texture_features=None,
):
    """Device-scan DRAS for one slide: returns (final_idxs [K], weights [N]).
    Compiled ONCE per (model, N, spi, ...) class (lru-cached jit — a fresh
    closure per call would re-enter the compile cache every slide); all
    `resampling_iterations` run inside a single lax.scan."""
    import jax.numpy as jnp

    n = int(features.shape[0])
    spi = min(cfg.samples_per_iteration, n)
    k_final = min(cfg.final_sample_size, n)
    neighbors = min(cfg.sampling_neighbors, n)
    if cfg.sampling_type == "spatial":
        X = jnp.asarray(coords, jnp.float32)
    elif texture_features is not None:
        X = jnp.asarray(texture_features, jnp.float32)
    else:
        X = jnp.asarray(features, jnp.float32)

    # per-iteration epsilon schedule (static, like the host loop)
    eps = []
    e = cfg.sampling_random
    for _ in range(cfg.resampling_iterations):
        eps.append(e)
        e = max(0.0, e - cfg.sampling_random_delta)

    run = _dras_device_fn(model, n, spi, k_final, neighbors,
                          cfg.resampling_iterations,
                          float(cfg.weight_smoothing))
    final, weights, sampled = run(params, features, X,
                                  jnp.asarray(eps, jnp.float32), key)
    return DrasResult(
        final_idxs=np.asarray(final),
        weights=np.asarray(weights),
        all_sampled=[int(i) for i in np.flatnonzero(np.asarray(sampled))])


@functools.lru_cache(maxsize=32)
def _dras_device_fn(model, n, spi, k_final, neighbors, iters, power):
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.ops.masking import masked_softmax

    def gumbel_topk(key, logp, k):
        g = jax.random.gumbel(key, logp.shape)
        _, idx = jax.lax.top_k(logp + g, k)
        return idx

    @jax.jit
    def run(params, features, X, eps, key):
        x_sq = jnp.sum(X * X, axis=1)
        weights0 = jnp.full((n,), 1e-4)                      # reference floor
        sampled0 = jnp.zeros((n,), bool)
        k0, key0 = jax.random.split(key)
        idxs0 = gumbel_topk(k0, jnp.zeros((n,)), spi)        # uniform init

        def body(carry, it):
            weights, sampled, idxs, key = carry
            sampled = sampled.at[idxs].set(True)
            bag = jnp.take(features, idxs, axis=0)           # [spi, D]
            a = model.apply(params, bag, None, attention_only=True)
            attn = masked_softmax(a, jnp.ones((1, spi), bool), axis=-1)[0]
            # exact kNN of the sampled points among all rows of X
            q = jnp.take(X, idxs, axis=0)
            d2 = (x_sq[None, :] - 2.0 * q @ X.T
                  + jnp.sum(q * q, axis=1)[:, None])         # [spi, N]
            _, nbrs = jax.lax.top_k(-d2, neighbors)          # [spi, k]
            # 'max' propagation: w[nbr] = max(w[nbr], attn_i^power),
            # then zero-out everything already sampled. segment_max over
            # the [spi*k] flattened neighbor list scatters ~2k elements;
            # the dense [spi*k, N] one-hot alternative materializes ~800MB
            # at N=100k (ADVICE r2 #5). Softmax attn >= 0, so clamping the
            # -inf empty-segment fill at 0 reproduces the dense semantics.
            vals = jnp.repeat(attn ** power, neighbors)
            prop = jax.ops.segment_max(vals, nbrs.reshape(-1),
                                       num_segments=n)
            weights = jnp.maximum(weights, jnp.maximum(prop, 0.0))
            weights = jnp.where(sampled, 0.0, weights)
            # epsilon-greedy mixture draw without replacement (Gumbel top-k)
            e = eps[it]
            wsum = jnp.maximum(weights.sum(), 1e-30)
            un = (~sampled).astype(jnp.float32)
            usum = jnp.maximum(un.sum(), 1.0)
            mix = (1.0 - e) * weights / wsum + e * un / usum
            logp = jnp.where(mix > 0, jnp.log(jnp.maximum(mix, 1e-30)),
                             -jnp.inf)
            kd, key = jax.random.split(key)
            nxt = gumbel_topk(kd, logp, spi)
            return (weights, sampled, nxt, key), None

        (weights, sampled, _, key), _ = jax.lax.scan(
            body, (weights0, sampled0, idxs0, key0), jnp.arange(iters))
        # final weighted draw over ALL patches (reference normalizes once);
        # degenerate all-zero weights fall back to uniform like the host path
        logp = jnp.where(weights > 0,
                         jnp.log(jnp.maximum(weights, 1e-30)), -jnp.inf)
        logp = jnp.where(weights.sum() > 0, logp, jnp.zeros_like(logp))
        kf, _ = jax.random.split(key)
        final = gumbel_topk(kf, logp, k_final)
        return final, weights, sampled

    return run
