"""Device mesh and multi-host utilities.

The distributed story (SURVEY.md §3.8): the reference lineage is
single-process shared-memory; this framework's new capability is SPMD data
parallelism over the observation axis — residual batches sharded over a
1-D ``Mesh(('obs',))``, parameter state replicated, J^T J / J^T r / Schur
contributions reduced by XLA-inserted psums (over ICI within a slice, DCN
across slices). DP over residual blocks is the only parallelism axis in a
NLLS solver — TP/PP/EP have no counterpart here (no layers/tokens/experts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["make_obs_mesh", "initialize_distributed", "obs_sharding"]


def make_obs_mesh(num_devices: Optional[int] = None):
    """1-D mesh over all (or the first n) addressable devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, found {len(jax.devices())}"
            )
    return Mesh(np.array(devices), axis_names=("obs",))


def obs_sharding(mesh, ndim: int = 1):
    """NamedSharding sharding axis 0 (observations) over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    return NamedSharding(mesh, PartitionSpec(axis, *([None] * (ndim - 1))))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host bring-up: ``jax.distributed.initialize`` with the usual
    env-var fallbacks; call once per process before building a mesh that
    spans hosts. No-op when already initialized or single-process."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process run without coordinator
        pass
    return jax.process_index(), jax.process_count()
