"""Mesh construction and sharding helpers.

The reference has no distributed runtime (SURVEY.md §2.7): its parallelism is
nn.DataParallel scatter/gather, a fork pool, and sequential CV folds. Here the
axes of parallelism are explicit mesh dimensions:

- ``fold``  — cross-validation folds (the reference runs them serially,
              main.py:231-282; we shard them across chips)
- ``data``  — bags/patches within a fold (replaces nn.DataParallel,
              extract_features_fp.py:217-218)
- ``inst``  — instances within one giant bag (sequence parallelism for
              full-slide inference; nothing analogous exists upstream)

Collectives ride ICI via XLA (psum/all_gather inside shard_map); no NCCL/MPI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Sequence[Tuple[str, int]]] = None,
              devices=None) -> Mesh:
    """Build a mesh. Default: all devices on a single 'fold' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [("fold", len(devices))]
    names = [n for n, _ in axis_sizes]
    sizes = [s for _, s in axis_sizes]
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {total} devices, "
                         f"got {len(devices)}")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def fold_sharding(mesh: Mesh, ndim_tail: int = 0,
                  axis: str = "fold") -> NamedSharding:
    """Shard the leading (fold) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * ndim_tail)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
