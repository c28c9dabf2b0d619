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
    # optional running-mean RGB (0-255 float), same weighting as the sdf.
    # The reference packs BGR into one float for CUDA atomics
    # (third_parties/fusion.py:221-224,283-294) and re-quantizes every frame;
    # three float channels keep the same semantics without the packing loss.
    color: jnp.ndarray | None = None


def create_tsdf_volume(dimensions: np.ndarray, voxel_size: float = 0.025,
                       with_color: bool = False
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
        color=(jnp.zeros(tuple(vol_dim) + (3,), jnp.float32)
               if with_color else None),
    )
    return vol, trunc


@partial(jax.jit, static_argnames=("voxel_size",), donate_argnums=(0,))
def integrate(vol: TSDFVolume, depth: jnp.ndarray, intr: jnp.ndarray,
              T_wc: jnp.ndarray, voxel_size: float,
              obs_weight: float = 1.0,
              rgb: jnp.ndarray | None = None) -> TSDFVolume:
    """Fuse one RGB-D frame (reference third_parties/fusion.py:208-294).

    ``rgb`` ([H, W, 3], 0-255) is fused as a per-voxel running mean with the
    same weights as the sdf when the volume was created ``with_color``."""
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
    color = vol.color
    if color is not None and rgb is not None:
        rgb_val = jnp.where(valid[..., None],
                            rgb[pyc, pxc].astype(jnp.float32), 0.0)
        col_new = (w_old[..., None] * color + obs_weight * rgb_val) / \
            w_new[..., None]
        color = jnp.where(valid[..., None], col_new, color)
    return vol.replace(
        sdf=jnp.where(valid, sdf_new, vol.sdf),
        weight=jnp.where(valid, w_new, vol.weight),
        color=color,
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


def sample_color(vol: TSDFVolume, pts_w: jnp.ndarray, voxel_size: float
                 ) -> jnp.ndarray:
    """Trilinear sample of the color volume at world points -> [N, 3] uint8.

    The reference colors mesh vertices by nearest-voxel lookup
    (third_parties/fusion.py:296-316); trilinear interpolation is strictly
    smoother and reduces to the same value at voxel centers.
    """
    if vol.color is None:
        raise ValueError("TSDF volume was created without color")
    c = (pts_w - vol.origin) / voxel_size
    dims = jnp.asarray(vol.sdf.shape, jnp.float32)
    c = jnp.clip(c, 0.0, dims - 1.0)
    f = jnp.floor(c).astype(jnp.int32)
    t = c - f
    hi = jnp.asarray([s - 1 for s in vol.sdf.shape], jnp.int32)
    f1 = jnp.minimum(f + 1, hi)
    out = jnp.zeros(pts_w.shape[:-1] + (3,), jnp.float32)
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                ix = f1[..., 0] if bx else f[..., 0]
                iy = f1[..., 1] if by else f[..., 1]
                iz = f1[..., 2] if bz else f[..., 2]
                w = ((t[..., 0] if bx else 1 - t[..., 0]) *
                     (t[..., 1] if by else 1 - t[..., 1]) *
                     (t[..., 2] if bz else 1 - t[..., 2]))
                out = out + w[..., None] * vol.color[ix, iy, iz]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
