"""Device mesh & sharding helpers.

The reference is single-threaded CPU with zero parallelism (SURVEY.md §2.7);
the math here is an embarrassingly-parallel map over frames/images, so the
canonical mesh is 1-D over ``'batch'`` — frames shard across chips over ICI,
and the only collectives the workload ever needs are the mean/all-gather
reductions XLA inserts for score aggregation. A 2-D ('batch', 'plane') mesh
is reserved for plane-sharded full-frame SVD at 8K+ (not needed below that:
one 4K plane is ~33 MB).

Multi-host: call :func:`init_distributed` before :func:`make_mesh` and the
mesh spans every process's local devices (DCN between hosts, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
PLANE_AXIS = "plane"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough for multi-host pods.

    Every given argument is forwarded — an explicit pod topology without
    a coordinator address (env-provided) used to be silently DROPPED,
    letting the process auto-detect into the wrong process_id instead of
    failing fast."""
    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              plane: int = 1) -> Mesh:
    """1-D ('batch',) mesh by default; pass plane>1 for the 2-D variant."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # devices[:n] would silently build a SMALLER mesh and report
            # n-device numbers measured on fewer chips
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available")
        devices = devices[:n_devices]
    devs = np.asarray(devices)
    if plane > 1:
        devs = devs.reshape(len(devices) // plane, plane)
        return Mesh(devs, (BATCH_AXIS, PLANE_AXIS))
    return Mesh(devs, (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for frame/image batches."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Put an array on the mesh sharded over its leading axis."""
    return jax.device_put(x, batch_sharding(mesh))
