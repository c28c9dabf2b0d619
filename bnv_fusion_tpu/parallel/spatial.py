"""Spatial sharding: the voxel map partitioned across chips by scene region.

Data parallelism (parallel/dp.py) replicates the table; this module shards it
— the memory-scaling story for scenes beyond one chip's HBM (SURVEY §2.5's
"spatial sharding" design item; the reference is single-GPU and simply OOMs,
e.g. ScanNet scene0647_00, reference run_inference_on_scannet.py:14).

Scheme (1-D mesh axis "sp", D devices):
* the dense slot map is sharded by flat voxel id into D contiguous slabs
  (device d owns flat ids [d*n_vox/D, (d+1)*n_vox/D)); value arrays are
  sharded by slot ([C/D, F] per device) — both scale 1/D per chip,
* local fusion: the point batch is sharded for the PointNet encode (compute
  DP), corner entries are all-gathered over ICI, and each device runs the
  sort-reduce accumulation for the entries whose voxels fall in ITS slab —
  non-owned entries mask to the sort sentinel, so ownership filtering is
  free inside the existing fuse kernel,
* decode: queries replicated; each device gathers latents for its owned
  corners (zeros elsewhere) and a psum over the mesh assembles the full
  8-corner neighborhood even when a cell straddles a slab boundary.

Semantics match the single-device path exactly (same per-voxel means and
weights; slot numbering is shard-local) — asserted in tests on the virtual
8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bnv_fusion_tpu import fusion, nn as bnn, voxel
from bnv_fusion_tpu import table_dense as tbd


def spatial_active_entries(table: tbd.DenseIndexedTable, n_shards: int):
    """Host-side (coords, features, weights, num_hits) extraction for a
    spatially sharded table: slot ids are shard-local, so the global value
    row of a voxel is shard_index * capacity_per_shard + local_slot."""
    slot_map = np.asarray(table.slot_map)
    features = np.asarray(table.features)
    weights = np.asarray(table.weights)
    num_hits = np.asarray(table.num_hits)
    nv_shard = slot_map.shape[0] // n_shards
    cap_shard = features.shape[0] // n_shards
    n_xyz = np.asarray(table.n_xyz, np.int64)
    flat = np.nonzero(slot_map >= 0)[0]
    shard = flat // nv_shard
    rows = shard * cap_shard + slot_map[flat]
    keys = np.stack([flat // (n_xyz[1] * n_xyz[2]),
                     (flat // n_xyz[2]) % n_xyz[1],
                     flat % n_xyz[2]], -1).astype(np.int32)
    return keys, features[rows], weights[rows], num_hits[rows]


def create_spatial_table(mesh: Mesh, n_xyz, capacity: int, feat_dims: int,
                         axis: str = "sp") -> tbd.DenseIndexedTable:
    """A DenseIndexedTable whose slot_map/value arrays are sharded over the
    mesh.  ``capacity`` is the GLOBAL slot budget (divided across shards);
    n_vox and capacity must divide the mesh size."""
    d = mesh.shape[axis]
    n_xyz = np.asarray(n_xyz, np.int64)
    n_vox = int(n_xyz.prod())
    if n_vox % d or capacity % d:
        raise ValueError("n_vox and capacity must divide the mesh size")
    table = tbd.create_dense_table(n_xyz, capacity, feat_dims)
    shard = NamedSharding(mesh, P(axis))
    return table.replace(
        slot_map=jax.device_put(table.slot_map, shard),
        features=jax.device_put(table.features, shard),
        weights=jax.device_put(table.weights, shard),
        num_hits=jax.device_put(table.num_hits, shard),
        # n_alloc becomes per-shard: stored as a [D] vector
        n_alloc=jax.device_put(jnp.zeros((d,), jnp.int32), shard),
        overflow=jax.device_put(jnp.zeros((d,), jnp.int32), shard),
    )


def _table_specs(axis: str):
    return tbd.DenseIndexedTable(
        slot_map=P(axis), slot_flat=P(axis), features=P(axis),
        weights=P(axis), num_hits=P(axis), n_alloc=P(axis),
        overflow=P(axis), n_xyz=P())


def make_spatial_fuse_frame(mesh: Mesh, params: Dict[str, Any],
                            voxel_size: float, min_pts_in_grid: int,
                            max_unique: int = 1 << 17, axis: str = "sp",
                            max_unique_cells: int | None = None):
    """Jitted fuse step over a spatially sharded table.

    TPU-first collective layout (matches parallel/dp.py): each chip runs
    the cell-keyed sort-reduce on its POINT shard
    (fusion._cellsort_reduce), all-gathers only the COMPACTED per-voxel
    partials (D x U x (F+2) floats instead of the raw D x 8N x (F+1)
    corner stream — ~14x less ICI traffic at 480x640), filters them by
    slab ownership and merges with one small sort; the slab-local slot
    allocation + running-mean update is unchanged.

    Signature: step(table, pts_w [N,3], normals [N,3], valid [N], bound_min,
    bound_max) -> (table, stats).  N must divide the mesh size.
    """
    d = mesh.shape[axis]

    def local_fn(table, pts_w, normals, valid, bound_min, bound_max):
        # table leaves arrive as THIS device's shard; rebuild a local view
        n_xyz = table.n_xyz
        nv_shard = table.slot_map.shape[0]
        me = jax.lax.axis_index(axis)
        lo = me * nv_shard
        n_vox_global = nv_shard * d
        fdim = table.feat_dims

        (flat_u, cnt_u, sum_u, umask, n_uni_shard, u, cells_dropped,
         n_valid) = fusion._cellsort_reduce(
            params, pts_w, normals, valid, bound_min, bound_max,
            voxel_size, jnp.float32, max_unique, max_unique_cells,
            n_xyz, n_vox_global, fdim)

        key = jnp.where(umask, flat_u, n_vox_global)
        keys_all = jax.lax.all_gather(key, axis)            # [D, U]
        cnt_all = jax.lax.all_gather(cnt_u, axis)
        sum_all = jax.lax.all_gather(sum_u, axis)
        m3 = d * u
        ka = keys_all.reshape(m3)
        # ownership filter -> slab-local flat ids; non-owned = sentinel
        local = ka - lo
        owned = (local >= 0) & (local < nv_shard) & (ka < n_vox_global)
        lk = jnp.where(owned, local, nv_shard).astype(jnp.int32)
        cc = jnp.where(owned, cnt_all.reshape(m3), 0.0).astype(jnp.int32)
        cs = jnp.where(owned[:, None], sum_all.reshape(m3, fdim), 0.0)

        ops = jax.lax.sort((lk, cc) + tuple(cs[:, j] for j in range(fdim)),
                           num_keys=1)
        lk_s, cc_s = ops[0], ops[1]
        cs_s = jnp.stack(ops[2:], axis=-1)
        prev = jnp.concatenate([jnp.full((1,), -1, lk_s.dtype), lk_s[:-1]])
        bnd = lk_s != prev
        ev = lk_s < nv_shard
        ccum = jnp.cumsum(cc_s)                             # int32, exact
        nxt = jnp.concatenate([bnd[1:], jnp.ones((1,), bool)])
        is_end = nxt & ev
        n_unique = jnp.sum(is_end).astype(jnp.int32)

        ub = min(max_unique, m3)
        idx = jax.lax.broadcasted_iota(jnp.int32, (m3, 1), 0)[:, 0]
        end = jax.lax.sort(jnp.where(is_end, idx, m3))[:ub]
        end = jnp.minimum(end, m3 - 1)
        bmask = jnp.arange(ub) < jnp.minimum(n_unique, ub)
        pend = jnp.concatenate([jnp.full((1,), -1, end.dtype), end[:-1]])
        flat_b = jnp.where(bmask, lk_s[end], nv_shard)
        clo = jnp.where(pend >= 0, ccum[jnp.maximum(pend, 0)], 0)
        cnt_b = (ccum[end] - clo).astype(jnp.float32)
        # a voxel appears at most once per chip: segments <= D, exact adds
        seg_len = (end - pend).astype(jnp.int32)
        S = jnp.zeros((ub, fdim), jnp.float32)
        for i in range(d):
            take = jnp.maximum(end - i, 0)
            S = S + jnp.where((i < seg_len)[:, None], cs_s[take], 0.0)

        # shard-local allocation (slot_map shard holds local slot ids)
        cap_shard = table.features.shape[0]
        flat_safe = jnp.minimum(flat_b, nv_shard - 1)
        existing = jnp.where(bmask, table.slot_map[flat_safe], -1)
        is_new = bmask & (existing < 0)
        rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        n_alloc = table.n_alloc[0]
        assign = n_alloc + rank
        fits = is_new & (assign < cap_shard)
        slot_map = table.slot_map.at[
            jnp.where(fits, flat_b, nv_shard)].set(
            jnp.where(fits, assign, 0), mode="drop", unique_indices=True)
        slots = jnp.where(fits, assign, existing)
        ok_u = slots >= 0
        slots = jnp.maximum(slots, 0)

        mean_u = S / jnp.maximum(cnt_b, 1.0)[:, None]
        new_w = jnp.minimum(cnt_b / 32.0, 1.0)
        keep = bmask & ok_u & (cnt_b >= min_pts_in_grid)
        old_w = jnp.where(keep, table.weights[slots], 0.0)
        old_f = jnp.where(keep[:, None], table.features[slots], 0.0)
        upd_w = old_w + new_w
        upd_f = (old_f * old_w[:, None] + mean_u * new_w[:, None]) / \
            jnp.maximum(upd_w, 1e-12)[:, None]
        widx = jnp.where(keep, slots, cap_shard)
        features = table.features.at[widx].set(upd_f, mode="drop",
                                               unique_indices=True)
        weights = table.weights.at[widx].set(upd_w, mode="drop",
                                             unique_indices=True)
        # num_hits parity with fusion.fuse_frame_sorted: real observations
        # only — meshing gates on it under mesh_require_observation
        old_h = jnp.where(keep, table.num_hits[slots], 0.0)
        num_hits = table.num_hits.at[widx].set(old_h + 1.0, mode="drop",
                                               unique_indices=True)
        n_new = jnp.sum(fits).astype(jnp.int32)
        dropped = jnp.maximum(n_unique - ub, 0) + \
            jnp.sum(is_new & ~fits).astype(jnp.int32)
        table = table.replace(
            slot_map=slot_map, features=features,
            weights=weights, num_hits=num_hits,
            n_alloc=(table.n_alloc + n_new)[:1],
            overflow=(table.overflow + dropped +
                      jnp.maximum(n_uni_shard - u, 0) +
                      cells_dropped.astype(jnp.int32))[:1])

        total_unique = jax.lax.psum(n_unique, axis)
        total_cnt = jax.lax.psum(jnp.sum(jnp.where(bmask, cnt_b, 0.0)), axis)
        stats = fusion.FrameStats(
            n_avg_pts=total_cnt / jnp.maximum(
                total_unique.astype(jnp.float32), 1.0),
            n_touched=total_unique.astype(jnp.float32),
            n_valid_pts=jax.lax.psum(n_valid, axis))
        return table, stats

    specs = _table_specs(axis)
    stats_spec = fusion.FrameStats(n_avg_pts=P(), n_touched=P(),
                                   n_valid_pts=P())
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(specs, P(axis), P(axis), P(axis), P(), P()),
                   out_specs=(specs, stats_spec), check_vma=False)
    return jax.jit(fn)


def make_spatial_decode(mesh: Mesh, params: Dict[str, Any],
                        voxel_size: float, min_pts_in_grid: int,
                        axis: str = "sp"):
    """Jitted SDF decode over the spatially sharded table.

    Signature: decode(table, coords [M,3] voxel coords) -> sdf [M].  Each
    device contributes the corners it owns; a psum assembles cells that
    straddle slab boundaries.
    """
    def local_fn(table, coords):
        n_xyz = table.n_xyz
        nv_shard = table.slot_map.shape[0]
        me = jax.lax.axis_index(axis)
        lo = me * nv_shard

        corners = voxel.corner_neighbors(coords)
        tw = voxel.trilinear_weights(coords, corners)
        local = voxel.local_offsets(coords, corners)
        m = coords.shape[0]
        k = corners.reshape(m * 8, 3)
        inside = jnp.all((k >= 0) & (k < n_xyz), axis=-1)
        flat = (k[:, 0] * (n_xyz[1] * n_xyz[2]) + k[:, 1] * n_xyz[2] +
                k[:, 2]) - lo
        owned = inside & (flat >= 0) & (flat < nv_shard)
        slots = jnp.where(owned, table.slot_map[jnp.clip(flat, 0,
                                                         nv_shard - 1)], -1)
        found = slots >= 0
        slots = jnp.maximum(slots, 0)
        feats = jnp.where(found[:, None], table.features[slots], 0.0)
        w = jnp.where(found, table.weights[slots], 0.0)
        # assemble full neighborhoods across slabs
        feats = jax.lax.psum(feats, axis).reshape(m, 8, -1)
        w = jax.lax.psum(w, axis).reshape(m, 8)

        alpha = bnn.decoder_apply(params, local, feats)[..., 0] * voxel_size
        sdf = jnp.sum(alpha * tw, axis=-1)
        mask = jnp.min(w, axis=-1) >= min_pts_in_grid
        return jnp.where(mask, sdf, voxel_size)

    specs = _table_specs(axis)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(specs, P()),
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)
