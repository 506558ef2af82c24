"""K-fold cross-validation experiment driver.

Mirrors the reference's main() fold loop and result artifacts
(reference: main.py:231-293): per-fold train -> summary.csv with
test/val AUC+acc per fold, per-fold per-slide CSVs (reference:
eval.py:238-246 fold_k.csv format), and the experiment-settings dump
(reference: main.py:504-506).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from hipt_abmil_atec23_tpu.data.bags import BagDataset, FeatureBagStore
from hipt_abmil_atec23_tpu.data.manifest import SlideManifest
from hipt_abmil_atec23_tpu.data.splits import (
    generate_kfold_splits, load_split_csv, save_split_csv, check_split_disjoint)
from hipt_abmil_atec23_tpu.engine.train import FoldResult, train_fold
from hipt_abmil_atec23_tpu.utils.config import ExperimentConfig


def resolve_fold_manifests(
    manifest: SlideManifest, cfg: ExperimentConfig, fold: int,
) -> Tuple[SlideManifest, SlideManifest, SlideManifest]:
    """Resolve (train, val, test) sub-manifests from split CSVs if present
    (reference: return_splits(from_id=False), main.py:233-239), else generate
    in-memory; always checks split disjointness."""
    split_csv = os.path.join(cfg.split_dir, f"splits_{fold}.csv") \
        if cfg.split_dir else None
    if split_csv and os.path.exists(split_csv):
        tr_ids, va_ids, te_ids = load_split_csv(split_csv)
        assert not (set(tr_ids) & set(te_ids)), "train/test overlap in splits"
        assert not (set(tr_ids) & set(va_ids)), "train/val overlap in splits"
        subs = [manifest.subset_by_slide_ids(ids)
                for ids in (tr_ids, va_ids, te_ids)]
    else:
        splits = generate_kfold_splits(manifest.labels, cfg.train.k,
                                       seed=cfg.train.seed)
        tr, va, te = splits[fold]
        check_split_disjoint((tr, va, te))
        subs = [SlideManifest(manifest.df.iloc[ids].reset_index(drop=True),
                              manifest.label_dict, manifest.n_classes)
                for ids in (tr, va, te)]
    return tuple(subs)  # type: ignore[return-value]


def make_fold_datasets(
    manifest: SlideManifest, store: FeatureBagStore, cfg: ExperimentConfig,
    fold: int, factory=None,
) -> Tuple[BagDataset, BagDataset, BagDataset]:
    """Fold datasets. `factory(sub_manifest, is_train)` overrides the default
    FeatureBagStore-backed BagDataset (used by the online-encoding path)."""
    subs = resolve_fold_manifests(manifest, cfg, fold)
    if factory is None:
        factory = lambda s, is_train: BagDataset(s.slide_ids, s.labels,
                                                 store, cfg.bags)
    return tuple(factory(s, i == 0)
                 for i, s in enumerate(subs))  # type: ignore[return-value]


def summary_csv_name(cfg: ExperimentConfig) -> str:
    """summary.csv, or summary_partial_{s}_{e}.csv for partial fold ranges
    (reference: main.py:285-293) so partial runs never clobber full ones."""
    k_start = cfg.train.k_start if cfg.train.k_start != -1 else 0
    k_end = cfg.train.k_end if cfg.train.k_end != -1 else cfg.train.k
    if (k_end - k_start) == cfg.train.k:
        return "summary.csv"
    return f"summary_partial_{k_start}_{k_end}.csv"


def run_cv(cfg: ExperimentConfig, manifest: SlideManifest,
           store: FeatureBagStore, *, verbose: bool = True
           ) -> Tuple[pd.DataFrame, List[FoldResult]]:
    """Sequential k-fold CV (reference: main.py:231-293). The fold-parallel
    device-sharded path lives in parallel/fold_parallel.py."""
    os.makedirs(cfg.results_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.results_dir,
                          f"experiment_{cfg.exp_code}.json"))
    k_start = cfg.train.k_start if cfg.train.k_start != -1 else 0
    k_end = cfg.train.k_end if cfg.train.k_end != -1 else cfg.train.k
    class_counts = manifest.class_counts()

    results: List[FoldResult] = []
    for fold in range(k_start, k_end):
        train_ds, val_ds, test_ds = make_fold_datasets(manifest, store, cfg, fold)
        res = train_fold(cfg, fold, train_ds, val_ds, test_ds, class_counts,
                         verbose=verbose)
        results.append(res)
        _write_fold_csv(cfg.results_dir, res)

    summary = pd.DataFrame({
        "folds": [r.fold for r in results],
        "test_auc": [r.test_auc for r in results],
        "val_auc": [r.val_auc for r in results],
        "test_acc": [r.test_acc for r in results],
        "val_acc": [r.val_acc for r in results],
    })
    summary.to_csv(os.path.join(cfg.results_dir, summary_csv_name(cfg)),
                   index=False)
    return summary, results


def _write_fold_csv(results_dir: str, res: FoldResult) -> None:
    """Per-slide fold results (reference: eval.py fold_k.csv: slide_id, Y,
    Y_hat, p_0..p_{C-1})."""
    n_classes = res.test_probs.shape[1]
    df = pd.DataFrame({"slide_id": res.test_slide_ids,
                       "Y": res.test_labels,
                       "Y_hat": res.test_probs.argmax(1)})
    for c in range(n_classes):
        df[f"p_{c}"] = res.test_probs[:, c]
    df.to_csv(os.path.join(results_dir, f"fold_{res.fold}.csv"), index=False)
