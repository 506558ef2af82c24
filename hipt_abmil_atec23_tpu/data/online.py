"""Online feature extraction during MIL training.

Capability parity with the reference's ``--extract_features`` path
(reference: utils/core_utils.py:106-119 builds a frozen encoder inside
train(); datasets/dataset_generic.py:457-494 reads raw patches per slide and
the train loop encodes them per step, core_utils.py:315-318, 403-406): the
MIL head trains directly from slide pixels with a frozen encoder in the loop
— no precomputed feature artifacts.

TPU redesign: per slide, the sampled coords are decoded as ONE native batch
and encoded with the jitted fixed-batch encoder (engine/encode.py), instead
of the reference's serial Python iteration over a torch dataset inside
__getitem__ (dataset_generic.py:490).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from hipt_abmil_atec23_tpu.data.bags import BagDataset
from hipt_abmil_atec23_tpu.engine.encode import Encoder, encode_slide
from hipt_abmil_atec23_tpu.slideio.patching import load_coords_h5
from hipt_abmil_atec23_tpu.slideio.reader import BaseSlide, open_slide
from hipt_abmil_atec23_tpu.utils.config import BagConfig


class OnlineEncodingBagDataset(BagDataset):
    """Bags computed on demand: sample coords -> native decode -> encoder.

    slide_paths: slide_id -> slide file path
    coords_dir:  directory of {slide_id}.h5 coords (tile stage output)
    """

    def __init__(self, slide_ids: Sequence[str], labels: np.ndarray,
                 encoder: Encoder, slide_paths: Dict[str, str],
                 coords_dir: str, cfg: BagConfig,
                 transform=None):
        # no FeatureBagStore: bags come from pixels
        super().__init__(slide_ids, labels, store=None, cfg=cfg)
        self.encoder = encoder
        self.slide_paths = slide_paths
        self.coords_dir = coords_dir
        self.transform = transform
        self._coords_cache: Dict[str, np.ndarray] = {}
        self._attrs_cache: Dict[str, Dict] = {}
        self._slides: Dict[str, BaseSlide] = {}
        self._feat_dim = encoder.feat_dim

    def _coords(self, slide_id: str) -> np.ndarray:
        if slide_id not in self._coords_cache:
            coords, attrs = load_coords_h5(
                os.path.join(self.coords_dir, f"{slide_id}.h5"))
            self._coords_cache[slide_id] = coords
            self._attrs_cache[slide_id] = attrs
        return self._coords_cache[slide_id]

    def _slide(self, slide_id: str) -> BaseSlide:
        if slide_id not in self._slides:
            self._slides[slide_id] = open_slide(self.slide_paths[slide_id])
        return self._slides[slide_id]

    def _full_bag(self, slide_id: str) -> np.ndarray:
        # Deliberately unsupported: callers that want real full-bag features
        # (DRAS sampling, evaluate_fold's feat_dim probe) must not silently
        # receive zeros. Encode to a FeatureBagStore first for those paths;
        # train_fold works because this class overrides pad_size() and its
        # callers pass feat_dim explicitly.
        raise NotImplementedError(
            "OnlineEncodingBagDataset computes bags on demand; full-bag "
            "access is not available. Precompute features (cli encode) for "
            "workflows that need whole-slide bags.")

    def get_bag(self, idx: int, rng: np.random.Generator,
                *, train: bool = True) -> np.ndarray:
        slide_id = self.slide_ids[idx]
        coords = self._coords(slide_id)
        cfg = self.cfg
        n = len(coords)
        if cfg.max_patches_per_slide and cfg.max_patches_per_slide < n:
            # with-replacement sampling like the reference's
            # np.random.choice at dataset_generic.py:465
            sel = rng.choice(n, cfg.max_patches_per_slide,
                             replace=cfg.sampling_with_replacement)
            coords = coords[sel]
        attrs = self._attrs_cache[slide_id]
        feats = encode_slide(
            self._slide(slide_id), coords, self.encoder,
            patch_level=int(attrs.get("patch_level", 0)),
            region_size=int(attrs.get("patch_size", self.encoder.input_size)),
            transform=self.transform if train else None)
        if train and cfg.perturb_variance > 0:
            feats = feats + rng.standard_normal(feats.shape).astype(np.float32) \
                * np.float32(cfg.perturb_variance)
        return feats

    def pad_size(self) -> int:
        cap = self.cfg.max_patches_per_slide or 0
        longest = max(len(self._coords(s)) for s in self.slide_ids)
        if cap:
            longest = min(longest, cap)
        return ((longest + 7) // 8) * 8

    def close(self):
        for s in self._slides.values():
            s.close()
        self._slides.clear()


class OnlineFeatureGather:
    """Lazy per-slide feature source for inference-time DRAS sampling with
    on-the-fly extraction (reference: --eval_features, eval_utils.py:231-260):
    only the patches DRAS actually samples are decoded and encoded, so a
    10^4-patch slide costs ~(iterations x samples_per_iteration) encoder
    calls instead of a full-slide encode.

    Duck-types the ndarray surface DRAS needs: ``len()``, ``.shape`` and
    ``.take(idxs, axis=0)``.
    """

    def __init__(self, slide: BaseSlide, coords: np.ndarray,
                 encoder: Encoder, *, patch_level: int = 0,
                 region_size: Optional[int] = None, transform=None):
        self.slide = slide
        self.coords = np.asarray(coords)
        self.encoder = encoder
        self.patch_level = patch_level
        self.region_size = region_size or encoder.input_size
        self.transform = transform
        # patch-index -> feature cache: DRAS's final bag re-reads every
        # previously sampled patch (the reference accumulates
        # all_previous_features for the same reason, eval_utils.py:426-429)
        self._cache: Dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.coords)

    @property
    def shape(self):
        return (len(self.coords), self.encoder.feat_dim)

    def take(self, idxs, axis: int = 0) -> np.ndarray:
        assert axis == 0
        idxs = np.asarray(idxs, int)
        missing = [int(i) for i in idxs if int(i) not in self._cache]
        if missing:
            feats = encode_slide(self.slide,
                                 self.coords[np.asarray(missing)],
                                 self.encoder, patch_level=self.patch_level,
                                 region_size=self.region_size,
                                 transform=self.transform)
            for j, i in enumerate(missing):
                self._cache[i] = feats[j]
        return np.stack([self._cache[int(i)] for i in idxs])


def build_feature_gathers(slide_paths: Dict[str, str], coords_dir: str,
                          encoder: Encoder, slide_ids: Sequence[str],
                          transform=None) -> Dict[str, "OnlineFeatureGather"]:
    """slide_id -> OnlineFeatureGather (and the matching coords lookup is
    each gather's ``.coords``)."""
    out = {}
    for sid in slide_ids:
        coords, attrs = load_coords_h5(
            os.path.join(coords_dir, f"{sid}.h5"))
        out[sid] = OnlineFeatureGather(
            open_slide(slide_paths[sid]), coords, encoder,
            patch_level=int(attrs.get("patch_level", 0)),
            region_size=int(attrs.get("patch_size", encoder.input_size)),
            transform=transform)
    return out
