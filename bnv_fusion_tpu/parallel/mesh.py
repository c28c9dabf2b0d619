"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    On hardware the axis rides ICI; under
    ``--xla_force_host_platform_device_count`` it is the virtual CPU mesh the
    tests and the driver's multi-chip dry run use.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
