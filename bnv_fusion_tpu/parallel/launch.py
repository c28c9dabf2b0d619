"""Multi-host launch helpers: the jax.distributed bring-up for pod slices.

The reference has no launcher/communication backend at all (SURVEY §2.5);
this is the TPU-native equivalent of the missing NCCL/MPI layer: one call per
host process, then the global device set is available to jax.sharding meshes
and every collective in parallel/ rides ICI (within slice) / DCN (across
slices) via XLA.

Typical pod usage (one process per host, e.g. under GKE or gcloud ssh --worker=all):

    from bnv_fusion_tpu.parallel import launch
    launch.initialize()              # TPU pods: coordinator auto-discovered
    mesh = launch.global_mesh(("dp",))
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed.  On TPU pods all arguments are
    auto-discovered from the environment; pass them explicitly for manual
    (e.g. CPU multi-process) bring-up.  Safe to call once per process."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_names: Sequence[str] = ("dp",),
                axis_sizes: Optional[Tuple[int, ...]] = None):
    """Mesh over ALL processes' devices (jax.devices() is global after
    initialize()).  With one axis the full device set is used; with several,
    sizes must multiply to the device count."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    if axis_sizes is None:
        if len(axis_names) != 1:
            raise ValueError("give axis_sizes for a multi-axis mesh")
        axis_sizes = (len(devices),)
    if int(np.prod(axis_sizes)) != len(devices):
        raise ValueError(
            f"axis sizes {axis_sizes} != device count {len(devices)}")
    return Mesh(devices.reshape(axis_sizes), tuple(axis_names))


def process_local_slice(n_items: int) -> slice:
    """This process's contiguous share of a global batch (host-side data
    loading for DP over multi-host meshes)."""
    import jax

    per = n_items // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
