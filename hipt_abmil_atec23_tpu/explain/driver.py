"""Config-driven batch heatmap generation.

Capability parity with the reference's explain stage driver (reference:
create_heatmaps.py + heatmaps/configs/config_template.yaml — namespaced
exp/data/patching/model/heatmap/sample arguments over a slide process list):
per slide it segments (or loads cached segmentation), enumerates a coarse
non-overlapping grid, encodes features ONCE, caches the attention blockmap,
rasterizes the heatmap, exports top-k ROIs, and optionally runs a
fine-grained overlapped pass.

Per BASELINE.json the fine pass re-uses cached attention where the grid
overlaps and only encodes genuinely new (shifted) coordinates.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from hipt_abmil_atec23_tpu.explain.heatmaps import (
    draw_heatmap, infer_attention, load_blockmap, sample_rois, save_blockmap)
from hipt_abmil_atec23_tpu.slideio.patching import (
    enumerate_coords, save_coords_h5, coords_attrs)
from hipt_abmil_atec23_tpu.slideio.reader import open_slide
from hipt_abmil_atec23_tpu.slideio.seg import SegmentationResult, segment_tissue
from hipt_abmil_atec23_tpu.utils.config import (
    EncoderConfig, ModelConfig, SegConfig, TileConfig, load_config_dict)


@dataclass
class HeatmapJobConfig:
    """Mirrors the reference YAML's namespaces (create_heatmaps.py:104-112)."""
    # exp/data arguments
    slide_dir: str = ""
    slides: Tuple[str, ...] = ()            # filenames; empty => all in dir
    save_dir: str = "heatmaps"
    ckpt_path: str = ""
    feat_dir: str = ""                      # reuse cached features when present
    # patching arguments
    patch_size: int = 4096
    step_size: int = 4096
    patch_level: int = 0
    seg: SegConfig = field(default_factory=lambda: SegConfig(use_otsu=True))
    # model arguments
    model: ModelConfig = field(default_factory=ModelConfig)
    n_classes: int = 2
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    # heatmap arguments
    vis_level: int = -1
    alpha: float = 0.4
    cmap: str = "coolwarm"
    blank_canvas: bool = False
    binarize: bool = False
    binary_thresh: float = 0.5
    use_seg_mask: bool = True
    # fine pass: overlapped grid with step = patch_size * fine_step_fraction
    fine_pass: bool = False
    fine_step_fraction: float = 0.5
    # sample arguments
    sample_topk: int = 8
    sample_mode: str = "topk"

    @classmethod
    def load(cls, path: str) -> "HeatmapJobConfig":
        d = load_config_dict(path)
        for key, sub in (("seg", SegConfig), ("model", ModelConfig),
                         ("encoder", EncoderConfig)):
            if key in d and isinstance(d[key], dict):
                d[key] = sub(**d[key])
        if "slides" in d:
            d["slides"] = tuple(d["slides"])
        return cls(**d)


def _load_mil(cfg: HeatmapJobConfig, feat_dim: int):
    import jax
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.engine.checkpoint import load_params
    from hipt_abmil_atec23_tpu.models import build_mil_model

    model = build_mil_model(cfg.model.model_type,
                            size_arg=cfg.model.model_size,
                            n_classes=cfg.n_classes)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((8, feat_dim), jnp.float32), None)
    if cfg.ckpt_path.endswith(".pt"):
        from hipt_abmil_atec23_tpu.models.convert import (
            clam_params_from_torch, load_torch_state_dict)
        loaded = clam_params_from_torch(
            load_torch_state_dict(cfg.ckpt_path, checkpoint_key=None),
            n_classes=cfg.n_classes,
            multi_branch=cfg.model.model_type == "clam_mb")
        merged = dict(template["params"])
        merged.update(loaded["params"])
        params = {"params": merged}
    else:
        params = load_params(cfg.ckpt_path, template)
    return model, params


def run_heatmap_job(cfg: HeatmapJobConfig, *, verbose: bool = True
                    ) -> List[Dict]:
    import cv2
    from hipt_abmil_atec23_tpu.engine.encode import build_encoder, encode_slide

    os.makedirs(cfg.save_dir, exist_ok=True)
    with open(os.path.join(cfg.save_dir, "heatmap_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    slides = list(cfg.slides) or sorted(
        f for f in os.listdir(cfg.slide_dir)
        if f.lower().endswith((".tif", ".tiff", ".svs", ".png", ".jpg")))
    encoder = build_encoder(cfg.encoder)
    tile_cfg = TileConfig(patch_size=cfg.patch_size, step_size=cfg.step_size,
                          patch_level=cfg.patch_level, seg=cfg.seg)
    results = []
    model = params = None

    for fname in slides:
        sid = os.path.splitext(fname)[0]
        out_dir = os.path.join(cfg.save_dir, sid)
        os.makedirs(out_dir, exist_ok=True)
        slide = open_slide(os.path.join(cfg.slide_dir, fname))

        # 1. segmentation (cached pickle like reference initialize_wsi)
        seg_pkl = os.path.join(out_dir, f"{sid}_seg.pkl")
        if os.path.exists(seg_pkl):
            seg = SegmentationResult.load(seg_pkl)
        else:
            seg = segment_tissue(slide, cfg.seg)
            seg.save(seg_pkl)

        # 2. coarse grid + features (cache-aware)
        coords = enumerate_coords(slide, seg, tile_cfg)
        if len(coords) == 0:
            # no tissue found (reference marks failed_seg and continues)
            slide.close()
            results.append({"slide_id": sid, "y_hat": None, "p": None,
                            "n_patches": 0, "status": "failed_seg"})
            if verbose:
                print(f"[heatmap] {sid}: no tissue, skipped")
            continue
        feats = _features_for(cfg, encoder, slide, sid, coords)
        if model is None:
            model, params = _load_mil(cfg, feats.shape[1])

        # 3. slide-level prediction + attention blockmap; large bags pool
        # through the fused Pallas kernel (ops/gated_attention_pool.py)
        import jax.numpy as jnp
        from hipt_abmil_atec23_tpu.ops.gated_attention_pool import apply_pooled
        out = apply_pooled(model, params, jnp.asarray(feats))
        y_hat = int(np.asarray(out.y_hat)[0])
        y_prob = np.asarray(out.y_prob)[0]
        scores = np.asarray(out.a_raw)[0]
        save_blockmap(os.path.join(out_dir, f"{sid}_blockmap.h5"),
                      coords, scores)

        hm = draw_heatmap(
            slide, coords, scores, cfg.patch_size,
            patch_level=cfg.patch_level,
            vis_level=None if cfg.vis_level < 0 else cfg.vis_level,
            seg=seg if cfg.use_seg_mask else None, alpha=cfg.alpha,
            cmap=cfg.cmap, blank_canvas=cfg.blank_canvas,
            binarize=cfg.binarize, thresh=cfg.binary_thresh)
        cv2.imwrite(os.path.join(out_dir, f"{sid}_heatmap.jpg"),
                    cv2.cvtColor(hm, cv2.COLOR_RGB2BGR))

        # 4. ROI export
        rois = sample_rois(coords, scores, k=cfg.sample_topk,
                           mode=cfg.sample_mode)
        patches = slide.read_regions(rois["sampled_coords"], cfg.patch_level,
                                     (cfg.patch_size, cfg.patch_size))
        for j, (p, sc) in enumerate(zip(patches, rois["sampled_scores"])):
            small = cv2.resize(p, (min(1024, p.shape[1]),) * 2,
                               interpolation=cv2.INTER_AREA)
            cv2.imwrite(os.path.join(out_dir, f"roi_{j}_{sc:.3f}.png"),
                        cv2.cvtColor(small, cv2.COLOR_RGB2BGR))

        # 5. optional fine overlapped pass; cached coarse attention is reused
        # for coords already scored, only new shifted coords are encoded
        if cfg.fine_pass:
            fine_step = max(1, int(cfg.patch_size * cfg.fine_step_fraction))
            fine_cfg = dataclasses.replace(tile_cfg, step_size=fine_step)
            fine_coords = enumerate_coords(slide, seg, fine_cfg)
            known = {tuple(c) for c in coords.tolist()}
            new_mask = np.array([tuple(c) not in known
                                 for c in fine_coords.tolist()])
            new_coords = fine_coords[new_mask]
            if len(new_coords):
                new_feats = encode_slide(slide, new_coords, encoder,
                                         patch_level=cfg.patch_level,
                                         region_size=cfg.patch_size)
                new_scores = infer_attention(model, params, new_feats) \
                    if len(new_feats) else np.zeros(0)
            else:
                new_scores = np.zeros(0)
            all_coords = np.concatenate([coords, new_coords]) \
                if len(new_coords) else coords
            all_scores = np.concatenate([scores, new_scores]) \
                if len(new_coords) else scores
            fine_hm = draw_heatmap(
                slide, all_coords, all_scores, cfg.patch_size,
                patch_level=cfg.patch_level,
                seg=seg if cfg.use_seg_mask else None, alpha=cfg.alpha,
                cmap=cfg.cmap)
            cv2.imwrite(os.path.join(out_dir, f"{sid}_heatmap_fine.jpg"),
                        cv2.cvtColor(fine_hm, cv2.COLOR_RGB2BGR))

        slide.close()
        rec = {"slide_id": sid, "y_hat": y_hat,
               "p": [float(v) for v in y_prob], "n_patches": len(coords)}
        results.append(rec)
        if verbose:
            print(f"[heatmap] {sid}: pred {y_hat} p={y_prob} "
                  f"({len(coords)} patches)")
    with open(os.path.join(cfg.save_dir, "predictions.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def _features_for(cfg, encoder, slide, sid, coords) -> np.ndarray:
    from hipt_abmil_atec23_tpu.engine.encode import encode_slide
    if cfg.feat_dir:
        from hipt_abmil_atec23_tpu.data.bags import FeatureBagStore
        store = FeatureBagStore(cfg.feat_dir)
        if store.exists(sid):
            return store.load_features(sid)
    return encode_slide(slide, coords, encoder, patch_level=cfg.patch_level,
                        region_size=cfg.patch_size)
