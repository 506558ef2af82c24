"""Synthetic pyramidal slides for tests and benchmarks.

Generates H&E-like images: white background, pink/purple tissue blobs with
optional holes — enough structure for the segmentation/tiling pipeline to be
exercised realistically (SURVEY.md §4 golden-file plan #2).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from hipt_abmil_atec23_tpu.slideio import native


def make_tissue_image(width: int = 4096, height: int = 4096,
                      n_blobs: int = 3, n_holes: int = 2,
                      seed: int = 0) -> np.ndarray:
    """RGB uint8 synthetic H&E-ish slide image (white bg, stained blobs)."""
    import cv2
    rng = np.random.default_rng(seed)
    img = np.full((height, width, 3), 255, np.uint8)
    mask = np.zeros((height, width), np.uint8)
    for _ in range(n_blobs):
        cx = int(rng.uniform(0.2, 0.8) * width)
        cy = int(rng.uniform(0.2, 0.8) * height)
        ax = int(rng.uniform(0.1, 0.3) * width)
        ay = int(rng.uniform(0.1, 0.3) * height)
        cv2.ellipse(mask, (cx, cy), (ax, ay),
                    float(rng.uniform(0, 180)), 0, 360, 1, -1)
    for _ in range(n_holes):
        cx = int(rng.uniform(0.3, 0.7) * width)
        cy = int(rng.uniform(0.3, 0.7) * height)
        r = int(rng.uniform(0.02, 0.06) * min(width, height))
        cv2.circle(mask, (cx, cy), r, 0, -1)
    # H&E-ish coloring + cellular texture
    noise = rng.integers(-25, 25, size=(height, width, 3), dtype=np.int16)
    tissue = np.array([199, 124, 180], np.int16) + noise  # pink-purple
    img[mask > 0] = np.clip(tissue, 0, 255).astype(np.uint8)[mask > 0]
    return img


def write_synthetic_slide(path: str, width: int = 4096, height: int = 4096,
                          n_levels: int = 4, tile: int = 256,
                          compression: int = native.COMPRESSION_JPEG,
                          seed: int = 0,
                          image: Optional[np.ndarray] = None,
                          ycbcr420: bool = False,
                          quality: int = 80) -> np.ndarray:
    """Write a synthetic pyramidal TIFF; returns the level-0 image.
    ycbcr420=True stores TCGA-style YCbCr 4:2:0 JPEG tiles."""
    img = image if image is not None else make_tissue_image(
        width, height, seed=seed)
    native.write_pyramid(path, img, tile=tile, n_levels=n_levels,
                         compression=compression, ycbcr420=ycbcr420,
                         quality=quality)
    return img
