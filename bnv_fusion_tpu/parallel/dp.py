"""Data-parallel fusion + optimization via shard_map over a 1-D mesh.

First-class multi-chip design (the reference is single-GPU only, SURVEY §2.5):

* ``make_sharded_fuse_frame`` — local fusion with the POINT batch sharded
  across chips: each chip encodes its shard (the MXU-heavy PointNet work),
  corner keys are all-gathered so every replica executes the identical hash
  insert (keeping the replicated table bitwise consistent), per-slot
  feature/count accumulators combine with psum, and the dense running-mean
  update is replicated.
* ``make_sharded_optimize_step`` — global fusion with RAYS sharded: each chip
  renders + differentiates its ray shard, latent gradients psum over ICI,
  the Adam update is replicated; the count_optim weight bump combines with
  pmax (touched-anywhere semantics).

Both return functions already jitted over the mesh; the same code runs on a
real TPU pod slice or the virtual CPU mesh used by tests and the driver's
multi-chip dry run.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bnv_fusion_tpu import fusion, render
from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu import tables as tbl


def make_sharded_fuse_frame(mesh: Mesh, params: Dict[str, Any],
                            voxel_size: float, min_pts_in_grid: int,
                            example_table: tbl.AnyTable,
                            axis: str = "dp"):
    """Jitted fuse step with points sharded over ``axis``.

    ``example_table`` provides the table pytree structure for the replicated
    sharding specs (works with both the dense slot-map and hash tables).
    Signature: step(table, pts_w [N,3], normals [N,3], valid [N], bound_min,
    bound_max) -> (table, stats); N must divide the mesh size.
    """

    def local_fn(table, pts_w, normals, valid, bound_min, bound_max):
        # pts_w/normals/valid arrive as this chip's shard
        n = pts_w.shape[0]
        cap = table.capacity
        fdim = table.feat_dims
        corners, feats, valid8 = fusion.encode_corner_features(
            params, pts_w, normals, valid, bound_min, bound_max, voxel_size)

        keys_local = corners.reshape(n * 8, 3)
        vmask_local = valid8.reshape(n * 8)
        # replicate the insert so every chip's table stays identical
        keys_all = jax.lax.all_gather(keys_local, axis, tiled=True)
        vmask_all = jax.lax.all_gather(vmask_local, axis, tiled=True)
        table, slots_all, ok_all = tbl.insert(table, keys_all, vmask_all)

        # local accumulation: this chip's corners are a contiguous slice of
        # the all-gathered batch
        idx_here = jax.lax.axis_index(axis) * (n * 8)
        slots = jax.lax.dynamic_slice_in_dim(slots_all, idx_here, n * 8)
        ok = jax.lax.dynamic_slice_in_dim(ok_all, idx_here, n * 8)
        idx = jnp.where(ok, slots, cap)
        feat_sum = jnp.zeros((cap, fdim), jnp.float32).at[idx].add(
            feats.reshape(n * 8, fdim), mode="drop")
        cnt = jnp.zeros((cap,), jnp.float32).at[idx].add(1.0, mode="drop")
        feat_sum = jax.lax.psum(feat_sum, axis)
        cnt = jax.lax.psum(cnt, axis)

        touched = cnt > 0
        mean_feats = feat_sum / jnp.maximum(cnt, 1.0)[:, None]
        new_w = jnp.minimum(cnt / 32.0, 1.0)
        keep = touched & (cnt >= min_pts_in_grid)
        old_w = table.weights
        upd_w = old_w + new_w
        upd_f = (table.features * old_w[:, None] +
                 mean_feats * new_w[:, None]) / \
            jnp.maximum(upd_w, 1e-12)[:, None]
        table = table.replace(
            features=jnp.where(keep[:, None], upd_f, table.features),
            weights=jnp.where(keep, upd_w, table.weights),
            # num_hits parity with fusion.fuse_frame: frames with a real
            # (>= min_pts) observation — the default config gates meshing on
            # it (mesh_require_observation), so the sharded path must track it
            num_hits=jnp.where(keep, table.num_hits + 1.0, table.num_hits))

        n_touched = jnp.sum(touched.astype(jnp.float32))
        stats = fusion.FrameStats(
            n_avg_pts=jnp.sum(cnt) / jnp.maximum(n_touched, 1.0),
            n_touched=n_touched,
            n_valid_pts=jax.lax.psum(jnp.sum(valid8[:, 0].astype(jnp.float32)), axis),
        )
        return table, stats

    table_spec = tbl.replicated_spec(example_table)
    stats_spec = fusion.FrameStats(n_avg_pts=P(), n_touched=P(),
                                   n_valid_pts=P())
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(table_spec, P(axis), P(axis), P(axis), P(), P()),
        out_specs=(table_spec, stats_spec),
        check_vma=False)
    return jax.jit(sharded)


def make_sharded_optimize_step(mesh: Mesh, params: Dict[str, Any],
                               voxel_size: float, min_pts_in_grid: int,
                               truncated_units: int, truncated_dist: float,
                               ray_max_dist: float,
                               example_table: tbl.AnyTable = None,
                               lr: float = 1e-3,
                               axis: str = "dp"):
    """Jitted global-fusion training step with rays sharded over ``axis``.

    Signature: step(features, weights, opt_state, table, rays, key, bound_min,
    n_xyz, sdf_delta) -> (features, weights, opt_state, loss).  The rays
    leading axis must divide the mesh size.
    """
    opt = optax.adam(lr)

    def chunk_loss(features, weights, table, rays, key, bound_min, n_xyz,
                   sdf_delta):
        t = table.replace(weights=weights)
        loss, corners = render.calculate_loss(
            features, t, params, rays, key, bound_min, voxel_size,
            min_pts_in_grid, truncated_units, truncated_dist, ray_max_dist,
            sdf_delta, n_xyz)
        return loss, corners

    grad_fn = jax.value_and_grad(chunk_loss, argnums=0, has_aux=True)

    def local_fn(features, weights, opt_state, table, rays, key, bound_min,
                 n_xyz, sdf_delta):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (loss, corners), g = grad_fn(features, weights, table, rays, key,
                                     bound_min, n_xyz, sdf_delta)
        g = jax.lax.psum(g, axis)
        loss = jax.lax.pmean(loss, axis)
        # count_optim: union of voxels touched by any chip's rays
        t = table.replace(weights=weights)
        slots, found = tbl.lookup(t, corners.reshape(-1, 3))
        idx = jnp.where(found, slots, t.capacity)
        bump = jnp.zeros((t.capacity,), jnp.float32).at[idx].max(
            1.0, mode="drop")
        bump = jax.lax.pmax(bump, axis)
        weights = weights + bump

        updates, opt_state = opt.update(g, opt_state, features)
        features = optax.apply_updates(features, updates)
        return features, weights, opt_state, loss

    table_spec = tbl.replicated_spec(example_table)
    rays_spec = render.Rays(
        uv=P(axis), gt_pts=P(axis), mask=P(axis), neighbor_pts=P(axis),
        neighbor_masks=P(axis), T_wc=P(), intr=P())
    opt_spec = jax.tree.map(lambda _: P(), opt.init(jnp.zeros((1, 1))))
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), opt_spec, table_spec, rays_spec, P(), P(),
                  P(), P()),
        out_specs=(P(), P(), opt_spec, P()),
        check_vma=False)
    return opt, jax.jit(sharded)
