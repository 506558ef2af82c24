"""K-fold cross-validation split generation with the reference's semantics.

Reference (utils/utils.py:125-152 ``generate_split``): StratifiedKFold over
class labels; fold i's test set is split i, its *val set is fold (i+1)'s test
set*, and train = everything else. Split CSVs have ragged train/val/test
slide-id columns (reference: splits/treatment_5fold_100/splits_0.csv,
dataset_generic.py save_splits :16-28).
"""
from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.model_selection import StratifiedKFold

Split = Tuple[np.ndarray, np.ndarray, np.ndarray]  # train, val, test indices


def generate_kfold_splits(
    labels: np.ndarray,
    n_splits: int = 5,
    seed: int = 7,
    shuffle: bool = True,
) -> List[Split]:
    """Stratified k-fold with val = next fold's test (reference:
    utils/utils.py:142-152). Unlike the reference (which leaves StratifiedKFold
    unseeded when shuffle=True is absent), we always seed for determinism."""
    indices = np.arange(len(labels))
    skf = StratifiedKFold(n_splits=n_splits, shuffle=shuffle,
                          random_state=seed if shuffle else None)
    test_sets = [test for _, test in skf.split(indices, labels)]
    splits: List[Split] = []
    for i in range(n_splits):
        test_ids = test_sets[i]
        val_ids = test_sets[(i + 1) % n_splits]
        excluded = set(test_ids) | set(val_ids)
        # dtype=int64 matters for the EMPTY case (k=2 leaves no train):
        # a default empty array is float64 and breaks downstream indexing
        train_ids = np.array([x for x in indices if x not in excluded],
                             dtype=np.int64)
        splits.append((train_ids, val_ids, test_ids))
    return splits


def save_split_csv(path: str, slide_ids: Sequence[str], split: Split) -> None:
    """Write the reference's splits_k.csv format: ragged columns of slide ids."""
    train, val, test = split
    cols = {
        "train": pd.Series([slide_ids[i] for i in train]),
        "val": pd.Series([slide_ids[i] for i in val]),
        "test": pd.Series([slide_ids[i] for i in test]),
    }
    pd.DataFrame(cols).to_csv(path)


def save_split_bool_csv(path: str, slide_ids: Sequence[str], split: Split) -> None:
    """Boolean-style split file (reference: save_splits(boolean_style=True),
    create_splits_seq.py:188)."""
    train, val, test = split
    rows, flags = [], []
    for name, ids in zip(["train", "val", "test"], [train, val, test]):
        for i in ids:
            rows.append(slide_ids[i])
            flags.append([name == "train", name == "val", name == "test"])
    pd.DataFrame(flags, index=rows, columns=["train", "val", "test"]).to_csv(path)


def save_split_descriptor(
    path: str, labels: np.ndarray, split: Split, n_classes: int
) -> None:
    """Per-class slide counts per split (reference: test_split_gen descriptor
    output, create_splits_seq.py:190-194)."""
    train, val, test = split
    rows = {}
    for name, ids in zip(["train", "val", "test"], [train, val, test]):
        # an EMPTY split (e.g. k=2: val=the other fold leaves no train)
        # arrives as a default-float empty array — coerce so indexing works
        ids = np.asarray(ids, dtype=np.int64)
        rows[name] = np.bincount(labels[ids], minlength=n_classes)
    pd.DataFrame(rows, index=[f"class_{c}" for c in range(n_classes)]).to_csv(path)


def load_split_csv(path: str) -> Tuple[List[str], List[str], List[str]]:
    """Read a reference-format splits_k.csv back into slide-id lists."""
    df = pd.read_csv(path, index_col=0, dtype=str)
    out = []
    for col in ["train", "val", "test"]:
        vals = df[col].dropna().astype(str).tolist()
        out.append(vals)
    return tuple(out)  # type: ignore[return-value]


def check_split_disjoint(split: Split) -> None:
    """Split-disjointness asserts (reference: test_split_gen
    dataset_generic.py:294-331)."""
    train, val, test = (set(s.tolist()) for s in split)
    assert not (train & val), "train/val overlap"
    assert not (train & test), "train/test overlap"
    assert not (val & test), "val/test overlap"
