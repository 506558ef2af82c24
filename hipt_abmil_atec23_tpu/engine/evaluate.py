"""Eval-stage driver: per-fold checkpoint inference + bootstrap CIs.

Capability parity with the reference (reference: eval.py, utils/eval_utils.py
initiate_model/eval/summary, bootstrapping.py): rebuild the model from config,
load each fold's checkpoint, produce per-slide fold_k.csv + summary.csv, and
pool fold CSVs into 100k-resample bootstrap confidence intervals — the
bootstrap runs as ONE vectorized device computation (engine/metrics.py)
instead of the reference's Python loop (bootstrapping.py:78-87).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from hipt_abmil_atec23_tpu.data.bags import BagDataset, FeatureBagStore
from hipt_abmil_atec23_tpu.data.manifest import SlideManifest
from hipt_abmil_atec23_tpu.engine import metrics as M
from hipt_abmil_atec23_tpu.engine.checkpoint import ckpt_path, load_params
from hipt_abmil_atec23_tpu.engine.experiment import make_fold_datasets, _write_fold_csv
from hipt_abmil_atec23_tpu.engine.train import FoldResult, build_step_fns, evaluate_split
from hipt_abmil_atec23_tpu.utils.config import ExperimentConfig
from hipt_abmil_atec23_tpu.utils.seeding import host_rng


FUSED_EVAL_MIN_BAG = 4096


def evaluate_full_bags_fused(cfg: ExperimentConfig, ds: BagDataset, params,
                             n_pad: int) -> Tuple[np.ndarray, float]:
    """Exact full-bag eval through the fused Pallas pooling kernel
    (ops/gated_attention_pool.py): one streaming launch per slide, no
    [N, L] HBM intermediates — the production path for un-subsampled
    10^4-10^5-instance bags. All bags pad to one shape so the kernel
    compiles once; validity is a dynamic mask operand."""
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.losses import make_per_sample_loss
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.ops.gated_attention_pool import apply_pooled

    model = build_mil_model(
        cfg.model.model_type, size_arg=cfg.model.model_size,
        dropout=cfg.model.drop_out, n_classes=cfg.task.n_classes,
        k_sample=cfg.model.k_sample, gate=cfg.model.gate,
        subtyping=cfg.model.subtyping)
    loss_fn = jax.jit(make_per_sample_loss(cfg.train.bag_loss))
    probs, nlls = [], []
    for sid, label in zip(ds.slide_ids, ds.labels):
        bag = ds._full_bag(sid)
        k = min(len(bag), n_pad)
        padded = np.zeros((n_pad, bag.shape[1]), np.float32)
        padded[:k] = bag[:k]
        mask = np.arange(n_pad) < k
        out = apply_pooled(model, params, jnp.asarray(padded),
                           jnp.asarray(mask), force=True)
        probs.append(np.asarray(out.y_prob)[0])
        nll = loss_fn(out.logits, jnp.asarray([label], jnp.int32))
        nlls.append(float(np.asarray(nll)[0]))
    return np.stack(probs), float(np.mean(nlls))


def evaluate_fold(cfg: ExperimentConfig, fold: int, ds: BagDataset,
                  class_counts: np.ndarray, models_dir: str,
                  n_pad: Optional[int] = None) -> FoldResult:
    """Load fold checkpoint, run deterministic inference over `ds`.

    Un-subsampled large bags (max_patches unset, pad >= FUSED_EVAL_MIN_BAG)
    on single-branch gated CLAM route through the fused kernel path."""
    feat_dim = ds._full_bag(ds.slide_ids[0]).shape[1]
    if n_pad is None:
        n_pad = ds.pad_size()
    ds._feat_dim = feat_dim
    fns = build_step_fns(cfg, class_counts, n_pad, feat_dim)
    import jax
    params = fns.init_params(jax.random.PRNGKey(0))
    cp = ckpt_path(models_dir, fold)
    if os.path.exists(cp):
        params = load_params(cp, params)
    else:
        # torch-format fallback: the reference's s_{fold}_checkpoint.pt
        pt = os.path.join(models_dir, f"s_{fold}_checkpoint.pt")
        if os.path.exists(pt):
            from hipt_abmil_atec23_tpu.models.convert import (
                load_torch_state_dict, clam_params_from_torch)
            sd = load_torch_state_dict(pt, checkpoint_key=None)
            loaded = clam_params_from_torch(
                sd, n_classes=cfg.task.n_classes,
                multi_branch=cfg.model.model_type == "clam_mb")
            # keep our randomly-initialized instance classifiers if absent
            merged = dict(params["params"])
            merged.update(loaded["params"])
            params = {"params": merged}
        else:
            raise FileNotFoundError(f"no checkpoint for fold {fold} "
                                    f"in {models_dir}")
    rng = host_rng(cfg.train.seed, 100 + fold)
    fused_ok = (cfg.model.model_type == "clam_sb" and cfg.model.gate
                and cfg.bags.max_patches_per_slide is None
                and n_pad >= FUSED_EVAL_MIN_BAG)
    if fused_ok:
        probs, loss = evaluate_full_bags_fused(cfg, ds, params, n_pad)
    else:
        probs, loss = evaluate_split(fns, params, ds, n_pad, rng)
    auc = M.auc_score(ds.labels, probs, cfg.task.n_classes)
    acc = M.accuracy(ds.labels, probs.argmax(1))
    return FoldResult(
        fold=fold, val_auc=float("nan"), test_auc=auc, val_acc=float("nan"),
        test_acc=acc, val_loss=float("nan"), test_loss=loss,
        stopped_epoch=-1, test_probs=probs, test_labels=ds.labels,
        test_slide_ids=list(ds.slide_ids))


def run_eval(cfg: ExperimentConfig, manifest: SlideManifest,
             store: FeatureBagStore, models_dir: str, save_dir: str,
             *, splits: str = "test", folds: Optional[Sequence[int]] = None
             ) -> pd.DataFrame:
    """Eval driver (reference: eval.py:140-246). `splits`: test | val | all."""
    os.makedirs(save_dir, exist_ok=True)
    cfg.save(os.path.join(save_dir, f"eval_experiment_{cfg.exp_code}.json"))
    folds = list(folds) if folds is not None else list(range(cfg.train.k))
    class_counts = manifest.class_counts()
    rows = []
    for fold in folds:
        if splits == "all":
            ds = BagDataset(manifest.slide_ids, manifest.labels, store,
                            cfg.bags)
        else:
            tr, va, te = make_fold_datasets(manifest, store, cfg, fold)
            ds = {"train": tr, "val": va, "test": te}[splits]
        res = evaluate_fold(cfg, fold, ds, class_counts, models_dir)
        _write_fold_csv(save_dir, res)
        rows.append({"folds": fold, "test_auc": res.test_auc,
                     "test_acc": res.test_acc, "loss": res.test_loss})
        print(f"[eval] fold {fold}: auc {res.test_auc:.4f} "
              f"acc {res.test_acc:.4f}")
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(save_dir, "summary.csv"), index=False)
    return df


def bootstrap_from_fold_csvs(
    dirs: Sequence[str], folds: Sequence[int], *,
    n_bootstraps: int = 100_000, seed: int = 0,
) -> Dict:
    """Pool fold_k.csv across folds/run repeats and bootstrap AUC/F1/acc/
    balanced-acc (reference: bootstrapping.py:24-113). Returns the summary
    dict plus the pooled confusion matrix."""
    frames = []
    for d in dirs:
        for k in folds:
            path = os.path.join(d, f"fold_{k}.csv")
            if os.path.exists(path):
                frames.append(pd.read_csv(path))
    if not frames:
        raise FileNotFoundError("no fold CSVs found")
    pooled = pd.concat(frames, ignore_index=True)
    # numeric sort: lexicographic would put p_10 before p_2 for 11+ classes
    prob_cols = sorted((c for c in pooled.columns if c.startswith("p_")),
                       key=lambda c: int(c[2:]))
    labels = pooled["Y"].values.astype(np.int32)
    probs = pooled[prob_cols].values.astype(np.float32)
    res = M.bootstrap_metrics(labels, probs, n_bootstraps=n_bootstraps,
                              seed=seed)
    out = res.summarize()
    out["confusion_matrix"] = M.confusion_matrix(
        labels, probs.argmax(1), len(prob_cols)).tolist()
    out["n_slides"] = int(len(pooled))
    out["mean_ce_loss"] = float(np.mean(
        -np.log(np.maximum(probs[np.arange(len(labels)), labels], 1e-12))))
    return out


def roc_curve_points(labels: np.ndarray, scores: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(fpr, tpr) at every distinct threshold, binary labels — the curve
    sklearn's roc_curve produces (reference: bootstrapping.py:70)."""
    order = np.argsort(-scores, kind="stable")
    y = labels[order].astype(np.float64)
    tps = np.cumsum(y)
    fps = np.cumsum(1.0 - y)
    # keep the last point of each tied-score run + the (0,0) origin
    distinct = np.r_[np.where(np.diff(scores[order]) != 0)[0], len(y) - 1]
    tpr = np.r_[0.0, tps[distinct] / max(tps[-1], 1e-12)]
    fpr = np.r_[0.0, fps[distinct] / max(fps[-1], 1e-12)]
    return fpr, tpr


def plot_roc_curves(dirs: Sequence[str], folds: Sequence[int],
                    out_path: str) -> str:
    """One pooled ROC curve per run-repeat dir on a single figure
    (reference: bootstrapping.py --plot_roc_curves, :69-77). Binary only."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    for rep, d in enumerate(dirs):
        frames = [pd.read_csv(os.path.join(d, f"fold_{k}.csv"))
                  for k in folds
                  if os.path.exists(os.path.join(d, f"fold_{k}.csv"))]
        if not frames:
            continue
        pooled = pd.concat(frames, ignore_index=True)
        labels = pooled["Y"].values.astype(np.int32)
        fpr, tpr = roc_curve_points(labels, pooled["p_1"].values)
        auc = float(np.trapezoid(tpr, fpr))
        label = f"Repeat {rep + 1} (AUC {auc:.3f})" if len(dirs) > 1 \
            else f"AUC {auc:.3f}"
        ax.plot(fpr, tpr, label=label)
    ax.plot([0, 1], [0, 1], "k--", lw=0.8)
    ax.set_xlabel("False positive rate")
    ax.set_ylabel("True positive rate")
    ax.legend(loc="lower right")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path
