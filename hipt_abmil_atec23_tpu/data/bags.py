"""Feature-bag storage and batched bag assembly.

Storage keeps the reference's on-disk contracts so artifacts interoperate:
``feat_dir/h5_files/{slide}.h5`` with ``features`` [N,D] + ``coords`` [N,2]
datasets and ``feat_dir/pt_files/{slide}.pt`` tensors
(reference: extract_features_fp.py:240-255). A fast ``.npy`` native format is
added for TPU pipelines.

Bag assembly re-designs ``Generic_MIL_Dataset.__getitem__``
(reference: datasets/dataset_generic.py:448-578) for static shapes: bags are
subsampled (``np.random.choice`` WITH replacement, matching reference :517-519),
optionally Gaussian-perturbed (noise = N(0,1)*perturb_variance, :521-525) or
swapped for a pre-extracted augmentation variant ``{slide}aug{k}.pt``
(:497-503), then padded into ``[B, N_pad, D]`` + mask batches ready for a
single jitted train step over B slides — replacing the reference's
one-slide-per-step DataLoader.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hipt_abmil_atec23_tpu.utils.config import BagConfig


def _load_pt(path: str) -> np.ndarray:
    import torch  # CPU torch only used at the artifact boundary

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


class FeatureBagStore:
    """Per-slide feature bags under a feature directory.

    Resolution order for reads: ``pt_files/{slide}.pt`` ->
    ``h5_files/{slide}.h5`` -> ``npy_files/{slide}.npy``.
    """

    def __init__(self, feat_dir: str):
        self.feat_dir = feat_dir

    # -- paths ---------------------------------------------------------
    def pt_path(self, slide_id: str) -> str:
        return os.path.join(self.feat_dir, "pt_files", f"{slide_id}.pt")

    def h5_path(self, slide_id: str) -> str:
        return os.path.join(self.feat_dir, "h5_files", f"{slide_id}.h5")

    def npy_path(self, slide_id: str) -> str:
        return os.path.join(self.feat_dir, "npy_files", f"{slide_id}.npy")

    def exists(self, slide_id: str) -> bool:
        return any(os.path.exists(p) for p in
                   (self.pt_path(slide_id), self.h5_path(slide_id),
                    self.npy_path(slide_id)))

    # -- reads ---------------------------------------------------------
    def load_features(self, slide_id: str) -> np.ndarray:
        pt = self.pt_path(slide_id)
        if os.path.exists(pt):
            return _load_pt(pt)
        h5 = self.h5_path(slide_id)
        if os.path.exists(h5):
            import h5py
            with h5py.File(h5, "r") as f:
                return np.asarray(f["features"], dtype=np.float32)
        npy = self.npy_path(slide_id)
        if os.path.exists(npy):
            return np.load(npy).astype(np.float32)
        raise FileNotFoundError(f"no feature bag for slide {slide_id!r} "
                                f"under {self.feat_dir}")

    def load_with_coords(self, slide_id: str) -> Tuple[np.ndarray, np.ndarray]:
        h5 = self.h5_path(slide_id)
        import h5py
        with h5py.File(h5, "r") as f:
            return (np.asarray(f["features"], dtype=np.float32),
                    np.asarray(f["coords"]))

    # -- writes --------------------------------------------------------
    def save(self, slide_id: str, features: np.ndarray,
             coords: Optional[np.ndarray] = None,
             formats: Sequence[str] = ("h5", "pt")) -> None:
        if "h5" in formats:
            import h5py
            os.makedirs(os.path.join(self.feat_dir, "h5_files"), exist_ok=True)
            with h5py.File(self.h5_path(slide_id), "w") as f:
                f.create_dataset("features", data=features)
                if coords is not None:
                    f.create_dataset("coords", data=coords)
        if "pt" in formats:
            import torch
            os.makedirs(os.path.join(self.feat_dir, "pt_files"), exist_ok=True)
            torch.save(torch.tensor(features), self.pt_path(slide_id))
        if "npy" in formats:
            os.makedirs(os.path.join(self.feat_dir, "npy_files"), exist_ok=True)
            np.save(self.npy_path(slide_id), features)


@dataclass
class BagBatch:
    """A static-shape batch of bags, ready for device transfer."""
    features: np.ndarray   # [B, N_pad, D] float32
    mask: np.ndarray       # [B, N_pad] bool
    labels: np.ndarray     # [B] int32
    slide_indices: np.ndarray  # [B] int32 rows into the split manifest


class BagDataset:
    """Assembles subsampled, padded bags for a manifest split."""

    def __init__(self, slide_ids: Sequence[str], labels: np.ndarray,
                 store: FeatureBagStore, cfg: BagConfig):
        self.slide_ids = list(slide_ids)
        self.labels = np.asarray(labels, dtype=np.int32)
        self.store = store
        self.cfg = cfg
        self._cache: Dict[str, np.ndarray] = {}
        self.cache_bags = True  # bags are small post-subsample; full bags cached

    def __len__(self) -> int:
        return len(self.slide_ids)

    def _full_bag(self, slide_id: str) -> np.ndarray:
        if self.cache_bags and slide_id in self._cache:
            return self._cache[slide_id]
        feats = self.store.load_features(slide_id)
        if feats.ndim != 2:
            feats = feats.reshape(feats.shape[0], -1)
        if self.cache_bags:
            self._cache[slide_id] = feats
        return feats

    def get_bag(self, idx: int, rng: np.random.Generator,
                *, train: bool = True) -> np.ndarray:
        slide_id = self.slide_ids[idx]
        cfg = self.cfg
        if train and cfg.number_of_augs > 0:
            # reference: random.randint(0, number_of_augs); 0 => original
            aug = int(rng.integers(0, cfg.number_of_augs + 1))
            if aug > 0:
                slide_id = f"{slide_id}aug{aug}"
        feats = self._full_bag(slide_id)
        n = len(feats)
        if cfg.max_patches_per_slide and cfg.max_patches_per_slide < n:
            idxs = rng.choice(n, cfg.max_patches_per_slide,
                              replace=cfg.sampling_with_replacement)
            feats = feats[idxs]
        if train and cfg.perturb_variance > 0:
            feats = feats + rng.standard_normal(feats.shape).astype(np.float32) \
                * np.float32(cfg.perturb_variance)
        return feats.astype(np.float32, copy=False)

    def pad_size(self) -> int:
        """Single static pad size: min(max bag length, max_patches_per_slide).
        Scans augmentation variants too — an `{slide}augN` bag longer than
        every original would otherwise be silently truncated by make_batch."""
        cap = self.cfg.max_patches_per_slide or 0
        ids = list(self.slide_ids)
        if self.cfg.number_of_augs > 0:
            ids += [f"{s}aug{a}" for s in self.slide_ids
                    for a in range(1, self.cfg.number_of_augs + 1)]
        longest = max(len(self._full_bag(s)) for s in ids)
        if cap:
            longest = min(longest, cap)
        return _round_up(longest, 8)

    def make_batch(self, indices: Sequence[int], rng: np.random.Generator,
                   n_pad: Optional[int] = None, *, train: bool = True) -> BagBatch:
        bags = [self.get_bag(i, rng, train=train) for i in indices]
        if n_pad is None:
            n_pad = _round_up(max(len(b) for b in bags), 8)
        d = bags[0].shape[1]
        feats = np.zeros((len(bags), n_pad, d), np.float32)
        mask = np.zeros((len(bags), n_pad), bool)
        for j, b in enumerate(bags):
            b = b[:n_pad]
            feats[j, :len(b)] = b
            mask[j, :len(b)] = True
        return BagBatch(features=feats, mask=mask,
                        labels=self.labels[list(indices)],
                        slide_indices=np.asarray(indices, np.int32))


def balanced_sample_weights(labels: np.ndarray, n_classes: int) -> np.ndarray:
    """Per-slide sampling weights N/count(class) (reference:
    make_weights_for_balanced_classes_split, utils/utils.py:207-215)."""
    counts = np.bincount(labels, minlength=n_classes).astype(np.float64)
    n = float(len(labels))
    w = n / np.maximum(counts, 1.0)
    return w[labels]


def epoch_order(labels: np.ndarray, n_classes: int, rng: np.random.Generator,
                weighted: bool) -> np.ndarray:
    """One epoch's slide visit order. Weighted mode samples len(labels)
    indices with replacement, probability proportional to inverse class
    frequency (reference: WeightedRandomSampler at utils/utils.py:91);
    unweighted mode is a plain shuffle (RandomSampler, :93)."""
    n = len(labels)
    if weighted:
        w = balanced_sample_weights(labels, n_classes)
        return rng.choice(n, size=n, replace=True, p=w / w.sum())
    return rng.permutation(n)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
