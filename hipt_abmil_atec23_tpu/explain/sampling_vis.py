"""DRAS sampling visualizations (reference: utils/sampling_utils.py:190-335):
scatter of sampled coords on a slide thumbnail, sampling-weight maps, and
iteration GIFs."""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from hipt_abmil_atec23_tpu.slideio.reader import BaseSlide


def plot_sampling(slide: BaseSlide, sample_coords: np.ndarray, out_path: str,
                  thumbnail_size: int = 1000, correct: bool = True) -> None:
    """Sampled coords scattered on a thumbnail; green if the prediction was
    correct, red otherwise (reference: plot_sampling)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    w0, h0 = slide.dimensions
    scale = thumbnail_size / max(w0, h0)
    lvl = slide.get_best_level_for_downsample(1.0 / scale)
    thumb = slide.read_level(lvl)
    dx, dy = slide.level_downsamples[lvl]
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(thumb)
    ax.scatter(sample_coords[:, 0] / dx, sample_coords[:, 1] / dy, s=6,
               c="green" if correct else "red", alpha=0.7)
    ax.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_weight_map(coords: np.ndarray, weights: np.ndarray, out_path: str,
                    point_size: int = 8) -> None:
    """Sampling-weight scatter map (reference: plot_weighting)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(coords[:, 0], -coords[:, 1], c=weights, s=point_size,
                    cmap="viridis")
    fig.colorbar(sc)
    ax.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def sampling_gif(frame_paths: Sequence[str], out_path: str,
                 fps: int = 2) -> None:
    """Stitch per-iteration frames into a GIF (reference: plot_sampling_gif).
    Frames are resized to the first frame's shape (bbox-tight saves vary)."""
    import cv2
    import imageio.v2 as imageio
    frames = [imageio.imread(p)[..., :3] for p in frame_paths]
    h, w = frames[0].shape[:2]
    frames = [f if f.shape[:2] == (h, w) else cv2.resize(f, (w, h))
              for f in frames]
    imageio.mimsave(out_path, frames, fps=fps)
