"""Multi-host (DCN) scale-out entry point.

The reference has no multi-node capability (SURVEY.md §2.7). This framework's
parallel axes (fold/data/inst) extend across hosts transparently once
jax.distributed is initialized: the same NamedSharding code paths emit DCN
collectives between hosts and ICI collectives within them.
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


def global_mesh(axis_name: str = "fold"):
    """A mesh over ALL global devices (hosts x chips) on one axis."""
    import jax
    from hipt_abmil_atec23_tpu.parallel.mesh import make_mesh
    return make_mesh([(axis_name, len(jax.devices()))])
