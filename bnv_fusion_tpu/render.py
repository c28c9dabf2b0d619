"""Differentiable volume rendering of SDF along camera rays + the fusion loss.

Rebuilds reference src/utils/render_utils.py (stratified_sampling:77-94,
hierarchical_sampling:191-233, get_camera_params:431-458,
render_with_rays:461-505, compute_sdf_loss:508-549, calculate_loss:551-594)
as pure jnp functions with explicit PRNG keys and static sample counts, so the
whole ray pipeline jit-compiles into the global-optimization step.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bnv_fusion_tpu import fusion, geometry, voxel
from bnv_fusion_tpu import tables as tbl


class Rays(NamedTuple):
    """One batch of supervision rays (fixed shapes; reference rays dict,
    src/datasets/fusion_inference_dataset.py:394-403)."""

    uv: jnp.ndarray              # [N, 2] float32 pixel coords
    gt_pts: jnp.ndarray          # [N, 3] world surface points
    mask: jnp.ndarray            # [N] float32 validity
    neighbor_pts: jnp.ndarray    # [N, K, 3] 3x3 pixel window world points
    neighbor_masks: jnp.ndarray  # [N, K] float32
    T_wc: jnp.ndarray            # [4, 4]
    intr: jnp.ndarray            # [3, 3]


def stratified_sampling(key, n_samples: int, distances: jnp.ndarray,
                        t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stratified distances in [0, d] per ray: [N, 1] -> [N, S, 1].

    Matches reference stratified_sampling (render_utils.py:77-94): linspace
    endpoints, jitter uniformly inside mid-point intervals.  ``t`` supplies
    pre-drawn jitter (the ray-sharded DP path draws the whole chunk's
    uniforms once and shards the rows, so each chip consumes exactly the
    rows the single-device path would).
    """
    n = distances.shape[0]
    ticks = jnp.linspace(0.0, 1.0, n_samples)[None, :] * distances  # [N, S]
    mids = 0.5 * (ticks[:, 1:] + ticks[:, :-1])
    upper = jnp.concatenate([mids, ticks[:, -1:]], axis=-1)
    lower = jnp.concatenate([ticks[:, :1], mids], axis=-1)
    if t is None:
        t = jax.random.uniform(key, (n, n_samples))
    return (lower + (upper - lower) * t)[..., None]


def draw_sampling_uniforms(key, n_rays: int, n_fine: int, n_coarse: int):
    """The exact jitter draws hierarchical_sampling(key, ...) would make —
    exposed so the ray-sharded DP path can draw once and shard rows."""
    k1, k2 = jax.random.split(key)
    return (jax.random.uniform(k1, (n_rays, n_fine)),
            jax.random.uniform(k2, (n_rays, n_coarse)))


def hierarchical_sampling(key, n_fine: int, n_coarse: int,
                          depths: jnp.ndarray, surface: jnp.ndarray,
                          ray_dirs: jnp.ndarray, cam_loc: jnp.ndarray,
                          offset_distance: float,
                          ts: Tuple[jnp.ndarray, jnp.ndarray] | None = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fine samples in a +-offset band around the surface + coarse samples
    from the camera, merged sorted (reference render_utils.py:191-233).

    depths/surface: [N] / [N, 3].  Returns (pts [N, S, 3], dists [N, S, 1]).
    ``ts`` optionally supplies the (fine, coarse) jitter draws (see
    draw_sampling_uniforms).
    """
    if ts is not None:
        t_fine, t_coarse = ts
        k1 = k2 = None
    else:
        k1, k2 = jax.random.split(key)
        t_fine = t_coarse = None
    negative_offset = jnp.where(depths - offset_distance < 0,
                                depths, offset_distance)
    start_pts = surface - negative_offset[:, None] * ray_dirs
    start_depths = jnp.linalg.norm(start_pts - cam_loc[None, :], axis=-1)

    fine = stratified_sampling(
        k1, n_fine, jnp.full_like(depths, 2.0 * offset_distance)[:, None],
        t=t_fine)
    fine = fine + start_depths[:, None, None]
    coarse = stratified_sampling(k2, n_coarse, depths[:, None], t=t_coarse)

    dists = jnp.sort(jnp.concatenate([fine, coarse], axis=1), axis=1)
    pts = cam_loc[None, None, :] + dists * ray_dirs[:, None, :]
    return pts, dists


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, det: bool = False) -> jnp.ndarray:
    """Inverse-CDF importance sampling along rays (NeRF-style).

    Rebuilds reference render_utils.sample_pdf (render_utils.py:97-139):
    bins [N, B], weights [N, B-1] -> samples [N, n_samples].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    n = cdf.shape[0]
    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples),
                             (n, n_samples))
    else:
        u = jax.random.uniform(key, (n, n_samples))

    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(idx - 1, 0)
    above = jnp.minimum(idx, cdf.shape[-1] - 1)
    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bins_lo = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1),
                                  axis=-1)
    bins_hi = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1),
                                  axis=-1)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)


def composite_occupancy(pts: jnp.ndarray, occupied_prob: jnp.ndarray,
                        dists: jnp.ndarray):
    """Expected surface point from per-sample occupancy along rays.

    Rebuilds reference render_utils.render_pts (render_utils.py:253-270):
    front-to-back compositing of pass-through probabilities.  pts [N, S, 3],
    occupied_prob [N, S], dists [N, S, 1].  Returns (expected_pts [N, 3],
    depth_prob [N, S], background_prob [N]).
    """
    passthrough = jnp.cumprod(1.0 - occupied_prob, axis=-1)
    passthrough = jnp.concatenate(
        [jnp.ones_like(passthrough[..., :1]), passthrough], axis=-1)
    background = passthrough[..., -1]
    depth_prob = passthrough[..., :-1] * occupied_prob
    expected = jnp.sum(depth_prob[..., None] * pts, axis=-2)
    return expected, depth_prob, background


def render_rays_sdf(features: jnp.ndarray, table: tbl.AnyTable,
                    params: Dict[str, Any], rays: Rays, key,
                    bound_min: jnp.ndarray, voxel_size: float,
                    min_pts_in_grid: int, truncated_units: int,
                    truncated_dist: float, ray_max_dist: float,
                    sdf_delta: jnp.ndarray | None, n_xyz: jnp.ndarray,
                    compute_dtype=jnp.float32, decode_layout: str = "rows",
                    n_fine: int = 0, n_coarse: int = 0):
    """Sample rays and decode SDF through the sparse volume.

    Reference render_with_rays (render_utils.py:461-505).  Returns
    (pred_sdf [N, S], pts [N, S, 3], cam_loc [3], touched corner coords for
    the count_optim weight bump).

    ``n_fine`` / ``n_coarse`` override the reference's sample-count formula
    (fine = truncated_units*2, coarse = ray_max_dist*5); 0 keeps it.
    """
    ray_dirs, cam_loc = geometry.get_camera_rays(rays.uv, rays.T_wc, rays.intr)
    gt_depths = jnp.linalg.norm(rays.gt_pts - cam_loc[None, :], axis=-1)
    pts, _ = hierarchical_sampling(
        key, n_fine or truncated_units * 2,
        n_coarse or int(ray_max_dist * 5), gt_depths,
        rays.gt_pts, ray_dirs, cam_loc, offset_distance=truncated_dist)

    n, s = pts.shape[:2]
    flat_pts = pts.reshape(n * s, 3)
    coords = voxel.position_to_coords(flat_pts, bound_min, voxel_size)
    corners = voxel.corner_neighbors(coords)
    pred = fusion.decode_points(
        features, table, params, flat_pts, bound_min, voxel_size,
        min_pts_in_grid, sdf_delta=sdf_delta, n_xyz=n_xyz,
        compute_dtype=compute_dtype, layout=decode_layout)
    return pred.reshape(n, s), pts, cam_loc, corners


def prepare_render(table, rays: Rays, key, bound_min: jnp.ndarray,
                    voxel_size: float, truncated_units: int,
                    truncated_dist: float, ray_max_dist: float,
                    sdf_delta: jnp.ndarray | None, n_xyz: jnp.ndarray,
                    ts=None, n_fine: int = 0, n_coarse: int = 0):
    """Feature-independent half of render_rays_sdf: sampling + gather prep.

    Pairs with eval_render_loss: differentiating only the feature-dependent
    tail yields SPARSE cotangent rows (see fusion.decode_prepare).
    ``n_fine`` / ``n_coarse`` as in render_rays_sdf (0 = reference formula)."""
    ray_dirs, cam_loc = geometry.get_camera_rays(rays.uv, rays.T_wc,
                                                 rays.intr)
    gt_depths = jnp.linalg.norm(rays.gt_pts - cam_loc[None, :], axis=-1)
    pts, _ = hierarchical_sampling(
        key, n_fine or truncated_units * 2,
        n_coarse or int(ray_max_dist * 5), gt_depths,
        rays.gt_pts, ray_dirs, cam_loc, offset_distance=truncated_dist,
        ts=ts)
    n, s = pts.shape[:2]
    prep = fusion.decode_prepare(table, pts.reshape(n * s, 3), bound_min,
                                 voxel_size, sdf_delta=sdf_delta,
                                 n_xyz=n_xyz)
    return prep, pts, cam_loc


def eval_render_loss(gathered_feats: jnp.ndarray, prep, params,
                     rays: Rays, pts: jnp.ndarray, cam_loc: jnp.ndarray,
                     voxel_size: float, min_pts_in_grid: int,
                     truncated_dist: float, compute_dtype=jnp.float32,
                     per_ray: bool = False, reduce: str = "mean"):
    """Differentiable tail: gathered feature rows -> chunk loss.

    eval_render_loss(features[prep.slots], ...) equals calculate_loss's
    loss output exactly.  ``reduce="sum"`` returns (summed error,
    valid-ray count) instead of the masked mean — the ray-sharded DP path
    psums both halves so the global masked mean matches single-device."""
    n, s = pts.shape[:2]
    pred = fusion.decode_eval(gathered_feats, prep, params, voxel_size,
                              min_pts_in_grid,
                              compute_dtype=compute_dtype).reshape(n, s)
    return compute_sdf_loss(rays, pred, pts, cam_loc, truncated_dist,
                            per_ray=per_ray, reduce=reduce)


def compute_sdf_loss(rays: Rays, pred_sdf: jnp.ndarray, pred_pts: jnp.ndarray,
                     cam_loc: jnp.ndarray, truncated_dist: float,
                     per_ray: bool = False, reduce: str = "mean"):
    """Neighborhood-corrected truncated L1 SDF loss
    (reference render_utils.compute_sdf_loss:508-549).

    With ``per_ray`` also returns the per-ray summed error [N] (used by the
    error-guided sampler to refresh its patch error maps, reference
    src/datasets/sampler.py:44-68)."""
    gt_depths = jnp.linalg.norm(rays.gt_pts - cam_loc[None, :],
                                axis=-1, keepdims=True)       # [N, 1]
    depths = jnp.linalg.norm(pred_pts - cam_loc[None, None, :], axis=-1)  # [N,S]
    gt_sdf = jnp.clip(gt_depths - depths, -truncated_dist, truncated_dist)
    valid_map = gt_sdf > max(-truncated_dist * 0.5, -0.05)

    # distance from each sample to the 3x3 neighborhood of the ray's surface
    d = jnp.linalg.norm(
        rays.neighbor_pts[:, None, :, :] - pred_pts[:, :, None, :], axis=-1)
    d = jnp.where(rays.neighbor_masks[:, None, :] > 0, d, 1e4)
    nearest = jnp.min(d, axis=-1)                              # [N, S]
    sign = jnp.where(gt_sdf > 0, 1.0, -1.0)
    gt_nearest_signed = jnp.clip(nearest * sign,
                                 -truncated_dist, truncated_dist)

    num_valid = jnp.sum(rays.mask) + 1e-4
    l1 = jnp.abs(pred_sdf - gt_nearest_signed) * valid_map
    ray_err = jnp.sum(l1, axis=-1) * rays.mask
    if reduce == "sum":
        # partial numerator/denominator for a cross-device masked mean
        return jnp.sum(ray_err), jnp.sum(rays.mask)
    loss = jnp.sum(ray_err) / num_valid
    if per_ray:
        return loss, ray_err
    return loss


def calculate_loss(features: jnp.ndarray, table: tbl.AnyTable,
                   params: Dict[str, Any], rays: Rays, key,
                   bound_min: jnp.ndarray, voxel_size: float,
                   min_pts_in_grid: int, truncated_units: int,
                   truncated_dist: float, ray_max_dist: float,
                   sdf_delta: jnp.ndarray | None, n_xyz: jnp.ndarray,
                   compute_dtype=jnp.float32, per_ray: bool = False,
                   decode_layout: str = "rows"):
    """Loss for one ray chunk + the corner coords to weight-bump
    (reference render_utils.calculate_loss:551-594).  With ``per_ray`` the
    aux is (corners, per-ray errors)."""
    pred_sdf, pts, cam_loc, corners = render_rays_sdf(
        features, table, params, rays, key, bound_min, voxel_size,
        min_pts_in_grid, truncated_units, truncated_dist, ray_max_dist,
        sdf_delta, n_xyz, compute_dtype, decode_layout=decode_layout)
    if per_ray:
        loss, ray_err = compute_sdf_loss(rays, pred_sdf, pts, cam_loc,
                                         truncated_dist, per_ray=True)
        return loss, (corners, ray_err)
    loss = compute_sdf_loss(rays, pred_sdf, pts, cam_loc, truncated_dist)
    return loss, corners
