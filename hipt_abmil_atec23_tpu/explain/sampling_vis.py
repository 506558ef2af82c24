"""DRAS sampling visualizations (reference: utils/sampling_utils.py:190-335):
scatter of sampled coords on a slide thumbnail, sampling-weight maps, and
iteration GIFs."""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from hipt_abmil_atec23_tpu.slideio.reader import BaseSlide


def _thumbnail(slide: BaseSlide, thumbnail_size: int):
    """(thumb, dx, dy): best-level read + host downscale to the requested
    size. get_best_level_for_downsample only PICKS a level — on a
    shallow-pyramid slide the best level can still be tens of thousands
    of pixels wide, so the read must be followed by a resize cap or a
    'thumbnail' materializes gigabytes on the 1-CPU host. dx/dy are the
    EFFECTIVE level-0 -> thumb downsamples after the resize."""
    w0, h0 = slide.dimensions
    scale = thumbnail_size / max(w0, h0)
    lvl = slide.get_best_level_for_downsample(1.0 / scale)
    thumb = slide.read_level(lvl)
    dx, dy = slide.level_downsamples[lvl]
    h, w = thumb.shape[:2]
    if max(w, h) > thumbnail_size:
        import cv2
        s = thumbnail_size / max(w, h)
        tw, th = max(1, int(w * s)), max(1, int(h * s))
        thumb = cv2.resize(thumb, (tw, th), interpolation=cv2.INTER_AREA)
        dx, dy = dx * (w / tw), dy * (h / th)
    return thumb, dx, dy


def plot_sampling(slide: BaseSlide, sample_coords: np.ndarray, out_path: str,
                  thumbnail_size: int = 1000, correct: bool = True) -> None:
    """Sampled coords scattered on a thumbnail; green if the prediction was
    correct, red otherwise (reference: plot_sampling)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    thumb, dx, dy = _thumbnail(slide, thumbnail_size)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(thumb)
    ax.scatter(sample_coords[:, 0] / dx, sample_coords[:, 1] / dy, s=6,
               c="green" if correct else "red", alpha=0.7)
    ax.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_weight_map(coords: np.ndarray, weights: np.ndarray, out_path: str,
                    point_size: int = 8,
                    slide: Optional[BaseSlide] = None,
                    sample_coords: Optional[np.ndarray] = None,
                    patch_size: int = 256,
                    thumbnail_size: int = 1000,
                    cmap: str = "jet") -> None:
    """Sampling-weight map (reference: plot_weighting /
    plot_weighting_gif frames, sampling_utils.py:244-335): jet-colored
    patch-center scatter, optionally over the slide thumbnail with the
    current iteration's samples overlaid in gray. Without a slide, a bare
    weight scatter (y-flipped to image orientation)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    if slide is not None:
        thumb, dx, dy = _thumbnail(slide, thumbnail_size)
        ax.imshow(thumb)
        half = patch_size / 2  # reference plots patch centers (+128)
        xs, ys = (coords[:, 0] + half) / dx, (coords[:, 1] + half) / dy
        sc = ax.scatter(xs, ys, c=weights, s=point_size, cmap=cmap,
                        alpha=0.6, marker="s", edgecolors="none")
        if sample_coords is not None and len(sample_coords):
            ax.scatter((sample_coords[:, 0] + half) / dx,
                       (sample_coords[:, 1] + half) / dy,
                       c="gray", s=point_size, alpha=0.8, marker="s",
                       edgecolors="none")
    else:
        sc = ax.scatter(coords[:, 0], -coords[:, 1], c=weights,
                        s=point_size, cmap=cmap)
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
