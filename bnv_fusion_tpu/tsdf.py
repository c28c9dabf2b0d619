"""Dense TSDF prior volume: a jitted classic TSDF fusion.

TPU-native replacement for the PyCUDA/numba TSDFVolume
(reference third_parties/fusion.py:22-340, used as the additive ``sdf_delta``
prior in reference src/run_e2e.py:62-71,169-186).  The reference launches an
inline CUDA kernel per frame; here the whole update — project all voxel
centers, gather depth, masked running mean — is one fused XLA program over a
dense [X, Y, Z] grid.

Reference quirks replicated deliberately:
* the volume is initialized to ``-trunc_margin`` (third_parties/fusion.py:30),
  i.e. unobserved space carries a weak negative prior,
* TSDF values are normalized (dist = min(1, diff/trunc)); callers rescale by
  ``voxel_size * 5`` (reference run_e2e.py:171,192),
* nearest-pixel (round) depth lookup, no bilinear.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from bnv_fusion_tpu import voxel as vx


class TSDFVolume(struct.PyTreeNode):
    sdf: jnp.ndarray      # [X, Y, Z] float32, normalized units
    weight: jnp.ndarray   # [X, Y, Z] float32
    origin: jnp.ndarray   # [3] float32 world position of voxel (0,0,0)


def create_tsdf_volume(dimensions: np.ndarray, voxel_size: float = 0.025
                       ) -> Tuple[TSDFVolume, float]:
    """Build the prior volume over the scene bounds (reference run_e2e.py:62-71).

    Returns (volume, trunc_margin).
    """
    min_c, max_c, _ = vx.get_world_range(np.asarray(dimensions), voxel_size)
    vol_dim = np.ceil((max_c - min_c) / voxel_size).astype(int)
    trunc = 5.0 * voxel_size
    vol = TSDFVolume(
        sdf=jnp.full(tuple(vol_dim), -trunc, jnp.float32),
        weight=jnp.zeros(tuple(vol_dim), jnp.float32),
        origin=jnp.asarray(min_c, jnp.float32),
    )
    return vol, trunc


@partial(jax.jit, static_argnames=("voxel_size",), donate_argnums=(0,))
def integrate(vol: TSDFVolume, depth: jnp.ndarray, intr: jnp.ndarray,
              T_wc: jnp.ndarray, voxel_size: float,
              obs_weight: float = 1.0) -> TSDFVolume:
    """Fuse one depth frame (reference third_parties/fusion.py:208-294)."""
    trunc = 5.0 * voxel_size
    dx, dy, dz = vol.sdf.shape
    ii = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 2)
    world = jnp.stack([ii, jj, kk], axis=-1) * voxel_size + vol.origin

    T_cw = jnp.linalg.inv(T_wc)
    cam = world @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = cam[..., 2]
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    px = jnp.round(cam[..., 0] * fx / safe_z + cx).astype(jnp.int32)
    py = jnp.round(cam[..., 1] * fy / safe_z + cy).astype(jnp.int32)

    h, w = depth.shape
    in_view = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (z > 0)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    depth_val = jnp.where(in_view, depth[pyc, pxc], 0.0)

    depth_diff = depth_val - z
    valid = (depth_val > 0) & (depth_diff >= -trunc)
    dist = jnp.minimum(1.0, depth_diff / trunc)

    w_old = vol.weight
    w_new = w_old + obs_weight
    sdf_new = (w_old * vol.sdf + obs_weight * dist) / w_new
    return vol.replace(
        sdf=jnp.where(valid, sdf_new, vol.sdf),
        weight=jnp.where(valid, w_new, vol.weight),
    )


def prepare_sdf_delta(vol: TSDFVolume, voxel_size: float,
                      truncated_dist: float, sdf_delta_weight: float
                      ) -> jnp.ndarray:
    """Scale the prior into the additive decode term (reference
    run_e2e.py:169-186): metric units (x voxel_size*5), clip to
    +-truncated_dist, times sdf_delta_weight."""
    metric = vol.sdf * (voxel_size * 5.0)
    clipped = jnp.clip(metric, -truncated_dist, truncated_dist)
    return clipped * sdf_delta_weight
