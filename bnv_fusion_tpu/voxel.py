"""Voxel-grid index math: world ranges, flat ids, corner neighbors, trilinear.

Replaces reference src/utils/voxel_utils.py (get_world_range, flatten,
unflatten, position<->coords) and the 8-corner floor/ceil enumeration
duplicated in reference src/models/fusion/modules.py:178-247,586-655.
All functions are pure jnp (except get_world_range, a host-side numpy setup
helper) and keep static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_world_range(dimensions: np.ndarray, voxel_size: float):
    """Scene bounds -> (min_coords, max_coords, n_xyz).

    Matches reference voxel_utils.get_world_range
    (src/utils/voxel_utils.py:83-88): pad each side by one voxel, snap max to
    an integer number of voxels.
    """
    dimensions = np.asarray(dimensions, dtype=np.float64)
    min_ = -dimensions / 2 - voxel_size
    max_ = dimensions / 2 + voxel_size
    n_xyz = np.ceil((max_ - min_) / voxel_size).astype(np.int64)
    max_ = min_ + voxel_size * n_xyz
    return (min_.astype(np.float32), max_.astype(np.float32),
            n_xyz.astype(np.int32))


def position_to_coords(pts, min_coords, voxel_size):
    """World position -> continuous voxel coords (src/utils/voxel_utils.py:37-42)."""
    return (pts - min_coords) / voxel_size


def coords_to_position(coords, min_coords, voxel_size):
    return coords * voxel_size + min_coords


def flatten_coords(coords: jnp.ndarray, n_xyz) -> jnp.ndarray:
    """Integer [..., 3] voxel coords -> flat id (src/utils/voxel_utils.py:62-65).

    Uses int64-free arithmetic: callers must ensure prod(n_xyz) < 2**31.
    """
    nx, ny, nz = n_xyz[0], n_xyz[1], n_xyz[2]
    return (coords[..., 0] * (ny * nz) + coords[..., 1] * nz + coords[..., 2])


def unflatten_ids(flat_id: jnp.ndarray, n_xyz) -> jnp.ndarray:
    """Flat id -> integer [..., 3] voxel coords (src/utils/voxel_utils.py:68-81)."""
    ny, nz = n_xyz[1], n_xyz[2]
    x = flat_id // (ny * nz)
    rest = flat_id % (ny * nz)
    y = rest // nz
    z = rest % nz
    return jnp.stack([x, y, z], axis=-1)


# Corner enumeration order matches the reference's get_neighbors
# (src/models/fusion/modules.py:586-655): (f,f,f),(c,f,f),(f,c,f),(f,f,c),
# (c,c,f),(c,f,c),(f,c,c),(c,c,c) where f=floor, c=ceil.  NOTE: ceil, not
# floor+1 — at exactly-integer coordinates the eight corners collapse into
# duplicates, which the trilinear normalization below accounts for.
_CORNER_PATTERN = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
     [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], dtype=np.int32)


def corner_neighbors(coords: jnp.ndarray) -> jnp.ndarray:
    """Continuous [..., 3] voxel coords -> [..., 8, 3] int32 corner coords."""
    f = jnp.floor(coords)
    c = jnp.ceil(coords)
    pattern = jnp.asarray(_CORNER_PATTERN, dtype=coords.dtype)  # [8,3]
    corners = jnp.where(pattern.astype(bool), c[..., None, :], f[..., None, :])
    return corners.astype(jnp.int32)


def trilinear_weights(coords: jnp.ndarray, corners: jnp.ndarray) -> jnp.ndarray:
    """Normalized trilinear blend weights for the 8 corners.

    ``prod(1 - |coords - corner|)`` normalized to sum 1 over the corner axis,
    replicating the duplicate-corner handling in reference
    sparse_volume.decode_pts (src/models/sparse_volume.py:798-816).
    Returns [..., 8].
    """
    local = coords[..., None, :] - corners.astype(coords.dtype)
    w = jnp.prod(1.0 - jnp.abs(local), axis=-1)
    denom = jnp.sum(w, axis=-1, keepdims=True)
    return w / jnp.maximum(denom, 1e-12)


def local_offsets(coords: jnp.ndarray, corners: jnp.ndarray) -> jnp.ndarray:
    """Normalized offsets (voxel units, in [-1, 1]) of a point from each corner."""
    return coords[..., None, :] - corners.astype(coords.dtype)


def get_frustrum_range(intr: np.ndarray, img_h: int, img_w: int,
                       max_depth: float, voxel_size: float):
    """Axis-aligned bounds + resolution of a camera frustum
    (reference voxel_utils.get_frustrum_range, src/utils/voxel_utils.py:97-106)."""
    corners_px = np.array([[0, 0], [img_w - 1, 0], [0, img_h - 1],
                           [img_w - 1, img_h - 1]], np.float64)
    x = (corners_px[:, 0] - intr[0, 2]) / intr[0, 0] * max_depth
    y = (corners_px[:, 1] - intr[1, 2]) / intr[1, 1] * max_depth
    pts = np.stack([x, y, np.full(4, max_depth)], -1)
    min_ = np.minimum(pts.min(0), 0)
    max_ = np.maximum(pts.max(0), 0)
    min_[2], max_[2] = 0.0, max_depth
    resolution = np.ceil((max_ - min_) / voxel_size)
    return min_, max_, resolution


def depth_to_tsdf(depth: jnp.ndarray, intr: jnp.ndarray, T_wc: jnp.ndarray,
                  query_pts_w: jnp.ndarray, truncated_dist: float
                  ) -> jnp.ndarray:
    """Per-frame projective TSDF of world query points against one depth map.

    jnp rebuild of the reference's dense depth_to_tsdf
    (src/utils/voxel_utils.py:391-555): project the query points into the
    frame, compare camera depth to the observed depth, truncate.  Points
    outside the image or unobserved get +truncated_dist.  Returns [N].
    """
    T_cw = jnp.linalg.inv(T_wc)
    cam = query_pts_w @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    u = jnp.round(cam[..., 0] * intr[0, 0] / safe_z + intr[0, 2]).astype(jnp.int32)
    v = jnp.round(cam[..., 1] * intr[1, 1] / safe_z + intr[1, 2]).astype(jnp.int32)
    h, w = depth.shape
    inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 0)
    d = jnp.where(inside, depth[jnp.clip(v, 0, h - 1), jnp.clip(u, 0, w - 1)],
                  0.0)
    sdf = jnp.clip(d - z, -truncated_dist, truncated_dist)
    return jnp.where(inside & (d > 0), sdf, truncated_dist)


def grid_transform(src: jnp.ndarray, src_min, src_voxel: float,
                   dst_min, dst_voxel: float, dst_shape) -> jnp.ndarray:
    """Resample a dense volume onto another grid by trilinear interpolation
    (reference voxel_utils.grid_transform, src/utils/voxel_utils.py:302-388)."""
    dx, dy, dz = dst_shape
    ii = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 2)
    world = (jnp.stack([ii, jj, kk], -1) * dst_voxel +
             jnp.asarray(dst_min, jnp.float32))
    c = (world - jnp.asarray(src_min, jnp.float32)) / src_voxel
    sx, sy, sz = src.shape
    c = jnp.clip(c, 0.0, jnp.asarray([sx - 1, sy - 1, sz - 1], jnp.float32))
    f = jnp.floor(c).astype(jnp.int32)
    t = c - f
    f1 = jnp.minimum(f + 1, jnp.asarray([sx - 1, sy - 1, sz - 1]))
    out = jnp.zeros((dx, dy, dz), src.dtype)
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                idx = jnp.stack([
                    f1[..., 0] if bx else f[..., 0],
                    f1[..., 1] if by else f[..., 1],
                    f1[..., 2] if bz else f[..., 2]], -1)
                wgt = ((t[..., 0] if bx else 1 - t[..., 0]) *
                       (t[..., 1] if by else 1 - t[..., 1]) *
                       (t[..., 2] if bz else 1 - t[..., 2]))
                out = out + wgt * src[idx[..., 0], idx[..., 1], idx[..., 2]]
    return out


def voxel_traversal(origin: np.ndarray, direction: np.ndarray,
                    max_dist: float, n_xyz: np.ndarray) -> np.ndarray:
    """Amanatides-Woo DDA: integer voxels crossed by a ray (host numpy).

    Replaces the reference's CPU voxel_traversal
    (src/utils/voxel_utils.py:109-251, which carried embedded pdb traps).
    ``origin`` is in voxel coords; returns [K, 3] int visited voxels.
    """
    origin = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-12)
    voxel_ = np.floor(origin).astype(np.int64)
    step = np.where(d >= 0, 1, -1).astype(np.int64)
    next_bound = voxel_ + (step > 0)
    with np.errstate(divide="ignore"):
        t_max = np.where(d != 0, (next_bound - origin) / d, np.inf)
        t_delta = np.where(d != 0, np.abs(1.0 / d), np.inf)
    visited = []
    t = 0.0
    n_xyz = np.asarray(n_xyz)
    while t <= max_dist:
        if np.all(voxel_ >= 0) and np.all(voxel_ < n_xyz):
            visited.append(voxel_.copy())
        elif visited:
            break  # left the volume after having entered it
        axis = int(np.argmin(t_max))
        t = t_max[axis]
        voxel_[axis] += step[axis]
        t_max[axis] += t_delta[axis]
    return (np.asarray(visited, np.int64) if visited
            else np.zeros((0, 3), np.int64))


def is_active(coords: jnp.ndarray, active_flags: jnp.ndarray,
              n_xyz) -> jnp.ndarray:
    """Whether integer voxel coords are inside the grid and flagged active
    (reference voxel_utils.is_active, src/utils/voxel_utils.py:558-587)."""
    inside = jnp.all((coords >= 0) & (coords < jnp.asarray(n_xyz)), axis=-1)
    c = jnp.clip(coords, 0, jnp.asarray(n_xyz) - 1)
    return inside & active_flags[c[..., 0], c[..., 1], c[..., 2]]
