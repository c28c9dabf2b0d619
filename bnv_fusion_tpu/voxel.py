"""Voxel-grid index math: world ranges, flat ids, corner neighbors, trilinear.

Replaces reference src/utils/voxel_utils.py (get_world_range, flatten,
unflatten, position<->coords) and the 8-corner floor/ceil enumeration
duplicated in reference src/models/fusion/modules.py:178-247,586-655.
All functions are pure jnp (except get_world_range, a host-side numpy setup
helper) and keep static shapes.
"""

from __future__ import annotations

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
