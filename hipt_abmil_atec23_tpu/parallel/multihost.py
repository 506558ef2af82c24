"""Multi-host (DCN) scale-out entry point.

The reference has no multi-node capability (SURVEY.md §2.7). This framework's
parallel axes (fold/data/inst) extend across hosts transparently once
jax.distributed is initialized: the same NamedSharding code paths emit DCN
collectives between hosts and ICI collectives within them.

Layout rule: put the OUTER (infrequently-communicating) axis across hosts —
fold-parallel CV never communicates between folds, so folds ride DCN for
free while each fold's data/inst collectives stay on intra-host ICI. The
2-D ``global_mesh(host_axis=...)`` encodes exactly that: the leading axis
maps across processes, the trailing axis within each process (jax orders
``jax.devices()`` by process).
"""
from __future__ import annotations

from typing import Optional


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed (no-op on a single process). Returns the
    global device count. On TPU pods the arguments auto-detect from the
    environment."""
    import jax
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return len(jax.devices())


def global_mesh(axis_name: str = "fold", *, host_axis: Optional[str] = None,
                n_hosts: Optional[int] = None):
    """A mesh over ALL global devices.

    - default: one ``axis_name`` axis over every device (hosts x chips
      flattened — jax's device order groups by process, so contiguous
      shards stay host-local);
    - ``host_axis``: a 2-D (host, chip) mesh — the leading axis spans
      processes (collectives over it ride DCN), the trailing axis spans
      each process's local devices (ICI). ``n_hosts`` overrides
      ``jax.process_count()`` to SIMULATE the host split on a single
      process (the dryrun/test path — same shardings, same collectives,
      one fewer network).
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from hipt_abmil_atec23_tpu.parallel.mesh import make_mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if host_axis is None:
        return make_mesh([(axis_name, len(devices))], devices=devices)
    hosts = n_hosts or jax.process_count()
    if len(devices) % hosts:
        raise ValueError(f"{len(devices)} devices do not split over "
                         f"{hosts} hosts")
    arr = np.asarray(devices).reshape(hosts, -1)
    return Mesh(arr, (host_axis, axis_name))
