"""Dense feature-grid encode/decode: the reference's ``return_dense`` path.

Rebuilds encode_pointcloud(return_dense=True) and decode_feature_grid_w_pts
(reference src/models/fusion/local_point_fusion.py:127-141,265-370) plus the
grid-sample decode semantics of ReplicateNeRFModel.forward_local/global
(reference src/models/fusion/modules.py:785-920,689-742).  Used by the
end-to-end ``training_global`` pretraining mode and by whole-shape meshing of
small scenes; the sparse table path (fusion.py) is the production route.

All shapes static: the grid resolution is a compile-time constant.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu import voxel


def encode_pointcloud_dense(params: Dict[str, Any], pts_w: jnp.ndarray,
                            normals: jnp.ndarray, valid: jnp.ndarray,
                            bound_min: jnp.ndarray, bound_max: jnp.ndarray,
                            voxel_size: float, n_xyz: Tuple[int, int, int],
                            min_pts_in_grid: int,
                            compute_dtype=jnp.float32):
    """Oriented points -> (feat_grid [X,Y,Z,F], count_grid [X,Y,Z]).

    Per-corner PointNet features segment-meaned into a dense grid; voxels
    with fewer than min_pts points keep zero features but keep their count
    (reference local_point_fusion.py:126-141).
    """
    from bnv_fusion_tpu import fusion

    nx, ny, nz = n_xyz
    corners, feats, valid8 = fusion.encode_corner_features(
        params, pts_w, normals, valid, bound_min, bound_max, voxel_size,
        compute_dtype)
    n = pts_w.shape[0]
    flat = voxel.flatten_coords(corners.reshape(n * 8, 3), (nx, ny, nz))
    ok = valid8.reshape(n * 8)
    inside = jnp.all((corners.reshape(n * 8, 3) >= 0) &
                     (corners.reshape(n * 8, 3) <
                      jnp.asarray([nx, ny, nz])), axis=-1)
    idx = jnp.where(ok & inside, flat, nx * ny * nz)
    fdim = feats.shape[-1]
    fsum = jnp.zeros((nx * ny * nz, fdim), jnp.float32).at[idx].add(
        feats.reshape(n * 8, fdim), mode="drop")
    cnt = jnp.zeros((nx * ny * nz,), jnp.float32).at[idx].add(
        1.0, mode="drop")
    mean = fsum / jnp.maximum(cnt, 1.0)[:, None]
    mean = jnp.where((cnt >= min_pts_in_grid)[:, None], mean, 0.0)
    return (mean.reshape(nx, ny, nz, fdim), cnt.reshape(nx, ny, nz))


def decode_dense_grid(params: Dict[str, Any], feat_grid: jnp.ndarray,
                      count_grid: jnp.ndarray, coords: jnp.ndarray,
                      voxel_size: float, min_pts_in_grid: int,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    """SDF at continuous voxel coords [M, 3] from a dense feature grid.

    Matches decode_feature_grid_w_pts's interpolate branch (reference
    local_point_fusion.py:281-329): nearest-sampled corner features, decoder
    masked to corners with >= min_pts points, blended with UNMASKED
    normalized trilinear weights; voxels with no valid corner get
    +voxel_size.
    """
    nx, ny, nz, fdim = feat_grid.shape
    dims = jnp.asarray([nx, ny, nz])
    corners = voxel.corner_neighbors(coords)                 # [M,8,3]
    tw = voxel.trilinear_weights(coords, corners)            # [M,8]
    local = voxel.local_offsets(coords, corners)             # [M,8,3]

    inside = jnp.all((corners >= 0) & (corners < dims), axis=-1)  # [M,8]
    c = jnp.clip(corners, 0, dims - 1)
    feats = jnp.where(inside[..., None],
                      feat_grid[c[..., 0], c[..., 1], c[..., 2]], 0.0)
    cnt = jnp.where(inside, count_grid[c[..., 0], c[..., 1], c[..., 2]], 0.0)
    mask = cnt >= min_pts_in_grid                            # [M,8]

    alpha = bnn.decoder_apply(params, local, feats,
                              compute_dtype=compute_dtype)[..., 0]
    alpha = alpha * voxel_size * mask                        # masked corners -> 0
    sdf = jnp.sum(alpha * tw, axis=-1)
    any_valid = jnp.any(mask, axis=-1)
    return jnp.where(any_valid, sdf, voxel_size)


def global_feature_decode(params: Dict[str, Any], feats: jnp.ndarray,
                          query_pts: jnp.ndarray,
                          compute_dtype=jnp.float32) -> jnp.ndarray:
    """Single-latent decode for local-patch training: [B, F] x [B, Q, 3]
    -> [B, Q] (reference decode_implicit with normalize=False,
    local_point_fusion.py:372-379)."""
    b, q = query_pts.shape[:2]
    fb = jnp.broadcast_to(feats[:, None, :], (b, q, feats.shape[-1]))
    return bnn.decoder_apply(params, query_pts, fb,
                             compute_dtype=compute_dtype)[..., 0]
