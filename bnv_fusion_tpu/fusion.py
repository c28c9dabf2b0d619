"""Local-level fusion: one jitted, fixed-shape per-frame integration step.

TPU-native rebuild of LitFusionPointNet.encode_pointcloud + _integrate
(reference src/models/fusion/local_point_fusion.py:81-151,647-673).  The
reference runs: bound-mask -> 8-corner expand -> PointNet (tcnn CUDA) ->
torch.unique + torch_scatter.scatter_mean -> min-pts filter -> HashMap
query/insert with a running weighted mean.  Here the whole step is one XLA
program with static shapes:

1. mask points to the (padded) scene bounds,
2. expand each point to its 8 voxel corners; encode (relative-offset, normal)
   6-vectors with the PointNet MLP (MXU matmuls over an [8N, 6] batch),
3. reduce the 8N (voxel id, feature) stream to per-voxel sums — on dense
   slot-map tables via the cell-keyed two-stage sort-reduce (default,
   fuse_frame_cellsort: sort the N points by containing cell, encode after
   the sort, one segmented scan over all 8 corner channels, then a small
   merge sort from cells to corner voxels; the corner-keyed single sort
   remains as fuse_frame_sorted / model.fuse_algorithm=corner), on hash
   tables via capacity-sized scatter accumulators.  Batched launches fold
   K frames into ONE table update (fuse_frames_merged: the running mean is
   associative), which removed the largest per-frame cost on v5e,
4. loop-free slot allocation for new voxels,
5. per-touched-slot running mean: weight = clip(count/32, 1), drop voxels
   with fewer than min_pts_in_grid points (reference semantics exactly).

Numerics match the reference update (same masking, clipping and mean, cross-
checked against a numpy transliteration in tests) — voxels under the min-pts
threshold occupy a slot here but keep zero weight/features, which decodes
identically to "absent".
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu import tables as tbl
from bnv_fusion_tpu import voxel


class FrameStats(NamedTuple):
    """Per-frame fusion statistics (device scalars).

    ``n_avg_pts`` mirrors the reference's voxel-occupancy statistic
    (src/models/fusion/local_point_fusion.py:143, sparse_volume.track_n_pts).
    """

    n_avg_pts: jnp.ndarray
    n_touched: jnp.ndarray
    n_valid_pts: jnp.ndarray


def encode_corner_features(params: Dict[str, Any], pts_w: jnp.ndarray,
                           normals: jnp.ndarray, valid: jnp.ndarray,
                           bound_min: jnp.ndarray, bound_max: jnp.ndarray,
                           voxel_size: float,
                           compute_dtype=jnp.float32):
    """Steps 1-2: bound mask, corner expansion, PointNet features.

    Returns (corner coords [N,8,3] int32, feats [N,8,F], valid8 [N,8] bool).
    """
    inside = jnp.all((pts_w > bound_min + voxel_size) &
                     (pts_w < bound_max - voxel_size), axis=-1)
    valid = valid & inside

    coords = voxel.position_to_coords(pts_w, bound_min, voxel_size)  # [N,3]
    corners = voxel.corner_neighbors(coords)                          # [N,8,3]
    rel = voxel.local_offsets(coords, corners)                        # [N,8,3] in [-1,1]
    pn_in = jnp.concatenate(
        [rel, jnp.broadcast_to(normals[:, None, :], rel.shape)], axis=-1)
    feats = bnn.encoder_apply(params, pn_in, compute_dtype)           # [N,8,F]
    valid8 = jnp.broadcast_to(valid[:, None], corners.shape[:2])
    return corners, feats, valid8


def fuse_frame(table: tbl.AnyTable, params: Dict[str, Any],
               pts_w: jnp.ndarray, normals: jnp.ndarray, valid: jnp.ndarray,
               bound_min: jnp.ndarray, bound_max: jnp.ndarray,
               voxel_size: float, min_pts_in_grid: int,
               compute_dtype=jnp.float32,
               max_unique: int = 1 << 19,
               algorithm: str = "cell",
               max_unique_cells: int | None = None,
               ) -> Tuple[tbl.AnyTable, FrameStats]:
    """Integrate one frame's oriented point cloud into the sparse volume.

    Fixed shapes: [N] points with a validity mask (padding allowed).  Safe to
    jit with ``voxel_size``/``min_pts_in_grid`` static.

    Slot-map tables (dense, block-sparse) take a sort-reduce fast path —
    ``algorithm="cell"`` (default) the two-stage cell-keyed sort
    (fuse_frame_cellsort, ~2x less sort traffic), ``"corner"`` the one-stage
    corner-keyed sort (fuse_frame_sorted); both produce identical fused
    tables.  The open-addressing fallback uses capacity-sized scatter
    accumulators.
    """
    from bnv_fusion_tpu import table_blocks as _blocks
    from bnv_fusion_tpu import table_dense as _dense

    if isinstance(table, (_dense.DenseIndexedTable,
                          _blocks.BlockIndexedTable)):
        if algorithm == "cell":
            return fuse_frame_cellsort(
                table, params, pts_w, normals, valid, bound_min, bound_max,
                voxel_size, min_pts_in_grid, compute_dtype, max_unique,
                max_unique_cells)
        return fuse_frame_sorted(table, params, pts_w, normals, valid,
                                 bound_min, bound_max, voxel_size,
                                 min_pts_in_grid, compute_dtype, max_unique)
    n = pts_w.shape[0]
    cap = table.capacity
    fdim = table.feat_dims

    corners, feats, valid8 = encode_corner_features(
        params, pts_w, normals, valid, bound_min, bound_max, voxel_size,
        compute_dtype)

    keys = corners.reshape(n * 8, 3)
    flat_valid = valid8.reshape(n * 8)
    table, slots, ok = tbl.insert(table, keys, flat_valid)

    # segment mean by slot: two scatter-adds (invalid/overflow -> dropped)
    idx = jnp.where(ok, slots, cap)
    feat_sum = jnp.zeros((cap, fdim), jnp.float32).at[idx].add(
        feats.reshape(n * 8, fdim), mode="drop")
    cnt = jnp.zeros((cap,), jnp.float32).at[idx].add(1.0, mode="drop")

    touched = cnt > 0
    mean_feats = feat_sum / jnp.maximum(cnt, 1.0)[:, None]
    # reference weighting: clip(count/32, max=1)  (local_point_fusion.py:660)
    new_w = jnp.minimum(cnt / 32.0, 1.0)
    keep = touched & (cnt >= min_pts_in_grid)

    old_w = table.weights
    upd_w = old_w + new_w
    upd_f = (table.features * old_w[:, None] + mean_feats * new_w[:, None]) / \
        jnp.maximum(upd_w, 1e-12)[:, None]

    features = jnp.where(keep[:, None], upd_f, table.features)
    weights = jnp.where(keep, upd_w, table.weights)
    # num_hits: frames that contributed a real (>= min_pts) observation —
    # distinguishes fused evidence from count_optim weight bumps at meshing
    num_hits = jnp.where(keep, table.num_hits + 1.0, table.num_hits)
    table = table.replace(features=features, weights=weights,
                          num_hits=num_hits)

    n_touched = jnp.sum(touched.astype(jnp.float32))
    stats = FrameStats(
        n_avg_pts=jnp.sum(cnt) / jnp.maximum(n_touched, 1.0),
        n_touched=n_touched,
        n_valid_pts=jnp.sum(valid8[:, 0].astype(jnp.float32)),
    )
    return table, stats


def fuse_frame_sorted(table, params: Dict[str, Any],
                      pts_w: jnp.ndarray, normals: jnp.ndarray,
                      valid: jnp.ndarray, bound_min: jnp.ndarray,
                      bound_max: jnp.ndarray, voxel_size: float,
                      min_pts_in_grid: int, compute_dtype=jnp.float32,
                      max_unique: int = 1 << 19):
    """Sort-based per-frame fusion for dense slot-map tables.

    TPU v5e profiling: XLA scatters cost ~60ns per scalar element of the
    UPDATE batch, so capacity-sized scatter accumulators over 8N corner
    entries dominate the frame (the original path).  Sorts and scans are
    nearly free (2.4M x 9-operand sort: ~8 ms).  This path therefore reduces
    the per-(point, corner) stream to per-voxel segments first:

      flatten -> lexicographic sort by voxel id -> segmented inclusive scan
      -> segment ends = per-voxel (feature sum, count) -> compact to
      [max_unique] -> dedup-free insert -> per-touched-slot running mean.

    Only O(unique voxels) elements ever enter a scatter.  Semantics are
    identical to the scatter path (same mean, clipping and min-pts masking —
    cross-checked against the numpy oracle in tests).
    """
    n = pts_w.shape[0]
    m = n * 8
    fdim = table.feat_dims
    n_xyz = table.n_xyz
    # static voxel count: dense tables = slot-map length; block tables carry
    # it explicitly (their map lives at block granularity)
    n_vox = (table.n_voxels if hasattr(table, "n_voxels")
             else table.slot_map.shape[0])

    corners, feats, valid8 = encode_corner_features(
        params, pts_w, normals, valid, bound_min, bound_max, voxel_size,
        compute_dtype)
    keys = corners.reshape(m, 3)
    ok_in = valid8.reshape(m)
    inside = jnp.all((keys >= 0) & (keys < n_xyz), axis=-1) & ok_in
    flat = (keys[:, 0] * (n_xyz[1] * n_xyz[2]) + keys[:, 1] * n_xyz[2] +
            keys[:, 2])
    flat = jnp.where(inside, flat, n_vox)  # invalid entries sort last

    # sorting dominates the frame (~17 ms at 2.4M x 9 f32 operands on v5e);
    # bfloat16 payloads halve its traffic.  bf16 quantizes the features
    # (~0.4% of their std) BEFORE the per-voxel mean — enabled only when the
    # caller passes compute_dtype=bfloat16 (model.fuse_dtype config).
    payload_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                     else jnp.float32)
    # zero invalid entries: masked points may carry NaN/garbage (e.g. NaN
    # depth) that would otherwise poison the global mean-centered cumsum
    f8 = jnp.where(inside[:, None], feats.reshape(m, fdim), 0.0)
    f8 = f8.astype(payload_dtype)
    sorted_ops = jax.lax.sort(
        (flat,) + tuple(f8[:, j] for j in range(fdim)), num_keys=1)
    flat_s = sorted_ops[0]
    feats_s = jnp.stack(sorted_ops[1:], axis=-1).astype(jnp.float32)  # [M, F]

    prev = jnp.concatenate([jnp.full((1,), -1, flat_s.dtype), flat_s[:-1]])
    boundary = flat_s != prev                                # segment starts
    entry_valid = flat_s < n_vox

    # per-segment sums via cumsum + boundary diff.  Features are centered by
    # their batch mean first so the global cumsum is a near-zero-mean random
    # walk and the end-start cancellation stays at float32 roundoff (an
    # uncentered all-positive channel would accumulate to ~2e6 and lose 3-4
    # digits).  The mean contribution is added back as mean * count.
    ch_mean = jnp.mean(feats_s, axis=0, keepdims=True)
    cum = jnp.cumsum(feats_s - ch_mean, axis=0)              # [M, F]

    nxt = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    is_end = nxt & entry_valid
    n_unique = jnp.sum(is_end).astype(jnp.int32)

    # compaction via sort (jnp.nonzero costs ~3x a plain sort here): segment
    # end positions ascend, padding (m) sorts last
    u = min(max_unique, m)
    idx_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    end_pos = jax.lax.sort(jnp.where(is_end, idx_m, m))[:u]
    end_pos = jnp.minimum(end_pos, m - 1)
    umask = jnp.arange(u) < jnp.minimum(n_unique, u)

    # valid entries sort before the sentinel, so segments tile [0, ...) and
    # segment k spans (end_{k-1}, end_k] — no second compaction needed
    prev_end = jnp.concatenate(
        [jnp.full((1,), -1, end_pos.dtype), end_pos[:-1]])
    flat_u = flat_s[end_pos]
    cnt_u = (end_pos - prev_end).astype(jnp.float32)
    cum_lo = jnp.where((prev_end >= 0)[:, None], cum[jnp.maximum(prev_end, 0)],
                       0.0)
    sum_u = cum[end_pos] - cum_lo + ch_mean * cnt_u[:, None]  # [U, F]

    table, stats = _integrate_unique(table, flat_u, cnt_u, sum_u, umask,
                                     n_unique, u, min_pts_in_grid)
    stats = stats._replace(
        # count points that survived the bound mask (actually fused)
        n_valid_pts=jnp.sum(valid8[:, 0].astype(jnp.float32)))
    return table, stats



def _integrate_unique(table, flat_u, cnt_u, sum_u, umask, n_unique, u,
                      min_pts_in_grid, extra_overflow=0):
    """Shared fuse tail: insert deduplicated voxels + running-mean update.

    ``flat_u``/``cnt_u``/``sum_u`` are per-UNIQUE-voxel flat ids, point
    counts and feature sums (padded to static width ``u``, live prefix
    flagged by ``umask``).  Applies the reference's _integrate semantics
    (local_point_fusion.py:647-673): weight = clip(count/32, 1), running
    weighted mean, voxels under min_pts dropped.
    """
    table, slots, ok = tbl.insert_unique_flat(
        table, jnp.where(umask, flat_u, -1), umask)
    dropped = jnp.maximum(n_unique - u, 0)

    # per-touched-slot running mean (reference _integrate semantics)
    mean_u = sum_u / jnp.maximum(cnt_u, 1.0)[:, None]
    new_w = jnp.minimum(cnt_u / 32.0, 1.0)
    keep = umask & ok & (cnt_u >= min_pts_in_grid)
    old_w = jnp.where(keep, table.weights[slots], 0.0)
    old_f = jnp.where(keep[:, None], table.features[slots], 0.0)
    upd_w = old_w + new_w
    upd_f = (old_f * old_w[:, None] + mean_u * new_w[:, None]) / \
        jnp.maximum(upd_w, 1e-12)[:, None]

    widx = jnp.where(keep, slots, table.capacity)
    features = table.features.at[widx].set(upd_f, mode="drop",
                                           unique_indices=True)
    weights = table.weights.at[widx].set(upd_w, mode="drop",
                                         unique_indices=True)
    # num_hits: count frames with a real (>= min_pts) observation, so meshing
    # can tell fused evidence apart from count_optim weight bumps
    old_h = jnp.where(keep, table.num_hits[slots], 0.0)
    num_hits = table.num_hits.at[widx].set(old_h + 1.0, mode="drop",
                                           unique_indices=True)
    table = table.replace(
        features=features, weights=weights, num_hits=num_hits,
        overflow=table.overflow + dropped.astype(jnp.int32) + extra_overflow)

    nf = jnp.maximum(n_unique.astype(jnp.float32), 1.0)
    stats = FrameStats(
        n_avg_pts=jnp.sum(jnp.where(umask, cnt_u, 0.0)) / nf,
        n_touched=n_unique.astype(jnp.float32),
        n_valid_pts=jnp.zeros(()),  # callers fill in
    )
    return table, stats


def fuse_frame_cellsort(table, params: Dict[str, Any],
                        pts_w: jnp.ndarray, normals: jnp.ndarray,
                        valid: jnp.ndarray, bound_min: jnp.ndarray,
                        bound_max: jnp.ndarray, voxel_size: float,
                        min_pts_in_grid: int, compute_dtype=jnp.float32,
                        max_unique: int = 1 << 17,
                        max_unique_cells: int | None = None):
    """Two-stage sort-reduce fusion keyed by the point's CONTAINING CELL.

    The 9-operand sort over all 8N (corner, feature) entries dominates
    fuse_frame_sorted (~17 ms at 2.4M rows on v5e).  But the 8 corner ids of
    a point are a function of its cell alone, so grouping can happen BEFORE
    corner expansion:

      stage 1: sort the N points by (containing cell, floor/ceil degeneracy
        code) — 2 int keys + 6 float payload at N rows, ~9x less sort traffic
        than the corner sort.  Encode AFTER the sort (same inputs row-wise,
        so features are bit-identical), then one segmented scan over [N, 8F]
        yields per-cell-group sums of all 8 corner features at once.
      stage 2: each unique cell group scatters into its 8 corner voxel ids
        (cell + pattern * degeneracy, matching voxel.corner_neighbors'
        floor/ceil collapse); one sort over 8*U_cells partial rows merges
        contributions across cells, a second segmented scan totals them.

    Counts ride int32 cumsums (exact); feature sums use the same mean-
    centered float trick as fuse_frame_sorted.  The tail (insert + running
    mean + min-pts masking) is shared, so semantics match the numpy oracle
    of the reference update (local_point_fusion.py:81-151,647-673).
    """
    fdim = table.feat_dims
    n_xyz = table.n_xyz
    n_vox = (table.n_voxels if hasattr(table, "n_voxels")
             else table.slot_map.shape[0])
    flat_u, cnt_u, sum_u, umask, n_unique, u, cells_dropped, n_valid = \
        _cellsort_reduce(params, pts_w, normals, valid, bound_min, bound_max,
                         voxel_size, compute_dtype, max_unique,
                         max_unique_cells, n_xyz, n_vox, fdim)
    table, stats = _integrate_unique(
        table, flat_u, cnt_u, sum_u, umask, n_unique, u, min_pts_in_grid,
        extra_overflow=cells_dropped.astype(jnp.int32))
    stats = stats._replace(n_valid_pts=n_valid)
    return table, stats


def _cellsort_reduce(params, pts_w, normals, valid, bound_min, bound_max,
                     voxel_size, compute_dtype, max_unique,
                     max_unique_cells, n_xyz, n_vox, fdim,
                     sort1_gather: bool = False):
    """Front half of the cell-keyed fusion: one frame's oriented points ->
    per-unique-voxel (flat id, point count, feature sum), padded to the
    static compaction width ``max_unique``.

    Returns (flat_u, cnt_u, sum_u, umask, n_unique, u, cells_dropped,
    n_valid_pts)."""
    n = pts_w.shape[0]
    u_cell = min(max_unique_cells if max_unique_cells else max_unique, n)
    s0 = n_xyz[1] * n_xyz[2]
    s1 = n_xyz[2]

    cell_s, mcode_s, coords_s, normals_s, n_inside = _cellsort_sort1(
        pts_w, normals, valid, bound_min, bound_max, voxel_size, n_xyz,
        n_vox, sort1_gather=sort1_gather)
    entry_valid = cell_s < n_vox

    corners_s = voxel.corner_neighbors(coords_s)       # [N,8,3]
    rel = voxel.local_offsets(coords_s, corners_s)     # [N,8,3]
    pn_in = jnp.concatenate(
        [rel, jnp.broadcast_to(normals_s[:, None, :], rel.shape)], axis=-1)
    feats = bnn.encoder_apply(params, pn_in, compute_dtype)  # [N,8,F]
    f8 = jnp.where(entry_valid[:, None, None], feats,
                   0.0).astype(jnp.float32).reshape(n, 8 * fdim)

    prev_c = jnp.concatenate([jnp.full((1,), -1, cell_s.dtype), cell_s[:-1]])
    prev_m = jnp.concatenate([jnp.full((1,), -1, mcode_s.dtype),
                              mcode_s[:-1]])
    boundary = (cell_s != prev_c) | (mcode_s != prev_m)
    ch_mean = jnp.mean(f8, axis=0, keepdims=True)
    cum = jnp.cumsum(f8 - ch_mean, axis=0)             # [N, 8F]
    nxt = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    is_end = nxt & entry_valid
    n_groups = jnp.sum(is_end).astype(jnp.int32)

    idx_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    end_pos = jax.lax.sort(jnp.where(is_end, idx_n, n))[:u_cell]
    end_pos = jnp.minimum(end_pos, n - 1)
    gmask = jnp.arange(u_cell) < jnp.minimum(n_groups, u_cell)
    prev_end = jnp.concatenate(
        [jnp.full((1,), -1, end_pos.dtype), end_pos[:-1]])
    cell_u = cell_s[end_pos]
    mcode_u = mcode_s[end_pos]
    gcnt = end_pos - prev_end                          # int32, exact
    cum_lo = jnp.where((prev_end >= 0)[:, None],
                       cum[jnp.maximum(prev_end, 0)], 0.0)
    gsum = cum[end_pos] - cum_lo + \
        ch_mean * gcnt.astype(jnp.float32)[:, None]    # [U_c, 8F]
    cells_dropped = jnp.maximum(n_groups - u_cell, 0)

    # ---- stage 2: merge per-cell partials into corner voxel totals ----
    pattern = jnp.asarray(voxel._CORNER_PATTERN)       # [8,3]
    moff = jnp.stack([(mcode_u >> 2) & 1, (mcode_u >> 1) & 1, mcode_u & 1],
                     axis=-1)                          # [U_c,3]
    offs = pattern[None, :, :] * moff[:, None, :]      # [U_c,8,3]
    ckey = cell_u[:, None] + offs[..., 0] * s0 + offs[..., 1] * s1 + \
        offs[..., 2]
    ckey = jnp.where(gmask[:, None], ckey, n_vox)
    m2 = u_cell * 8
    ck = ckey.reshape(m2)
    f2 = jnp.where(gmask[:, None, None], gsum.reshape(u_cell, 8, fdim),
                   0.0).reshape(m2, fdim)
    c2 = jnp.where(gmask[:, None], jnp.broadcast_to(gcnt[:, None],
                                                    (u_cell, 8)),
                   0).reshape(m2)                      # int32

    ops2 = jax.lax.sort(
        (ck,) + tuple(f2[:, j] for j in range(fdim)) + (c2,), num_keys=1)
    ck_s = ops2[0]
    f2_s = jnp.stack(ops2[1:1 + fdim], axis=-1)
    c2_s = ops2[-1]

    prev2 = jnp.concatenate([jnp.full((1,), -1, ck_s.dtype), ck_s[:-1]])
    b2 = ck_s != prev2
    ev2 = ck_s < n_vox
    mean2 = jnp.mean(f2_s, axis=0, keepdims=True)
    cum2 = jnp.cumsum(f2_s - mean2, axis=0)
    ccum2 = jnp.cumsum(c2_s)                           # int32, exact
    nxt2 = jnp.concatenate([b2[1:], jnp.ones((1,), bool)])
    is_end2 = nxt2 & ev2
    n_unique = jnp.sum(is_end2).astype(jnp.int32)

    u = min(max_unique, m2)
    idx2 = jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0)[:, 0]
    end2 = jax.lax.sort(jnp.where(is_end2, idx2, m2))[:u]
    end2 = jnp.minimum(end2, m2 - 1)
    umask = jnp.arange(u) < jnp.minimum(n_unique, u)
    pend2 = jnp.concatenate([jnp.full((1,), -1, end2.dtype), end2[:-1]])
    flat_u = ck_s[end2]
    seg_n = (end2 - pend2).astype(jnp.float32)
    clo = jnp.where(pend2 >= 0, ccum2[jnp.maximum(pend2, 0)], 0)
    cnt_u = (ccum2[end2] - clo).astype(jnp.float32)    # exact int totals
    flo = jnp.where((pend2 >= 0)[:, None], cum2[jnp.maximum(pend2, 0)], 0.0)
    sum_u = cum2[end2] - flo + mean2 * seg_n[:, None]

    return (flat_u, cnt_u, sum_u, umask, n_unique, u, cells_dropped,
            n_inside)


def _cell_keys(pts_w, valid, bound_min, bound_max, voxel_size, n_xyz, n_vox):
    """Bound mask + (cell, mcode) keys of one frame's points — the f32
    device semantics every width below is sized against.  Shared by the
    sort front and the width probe so the two can never drift (a numpy-f64
    re-derivation undercounts ~25% at the bench point, RESULTS.md).

    Returns (inside, cell, mcode) with invalid entries at (n_vox, 8)."""
    inside = jnp.all((pts_w > bound_min + voxel_size) &
                     (pts_w < bound_max - voxel_size), axis=-1) & valid
    coords = voxel.position_to_coords(pts_w, bound_min, voxel_size)
    fl = jnp.floor(coords)
    mi = (jnp.ceil(coords) > fl).astype(jnp.int32)
    fi = fl.astype(jnp.int32)
    inside = inside & jnp.all(fi >= 0, axis=-1) & \
        jnp.all(fi + mi < n_xyz, axis=-1)
    s0 = n_xyz[1] * n_xyz[2]
    s1 = n_xyz[2]
    cell = fi[:, 0] * s0 + fi[:, 1] * s1 + fi[:, 2]
    mcode = mi[:, 0] * 4 + mi[:, 1] * 2 + mi[:, 2]
    cell = jnp.where(inside, cell, n_vox)
    mcode = jnp.where(inside, mcode, 8)
    return inside, cell, mcode, coords


def frame_width_counts(pts_w, valid, bound_min, bound_max, voxel_size,
                       n_xyz, n_vox):
    """Device-f32 occupancy of ONE frame: (#unique (cell,mcode) groups,
    #unique corner voxels) — the exact quantities the static compaction
    widths ``max_unique_cells_per_frame`` / ``max_unique_per_frame`` bound.

    Runs the same key math as the fuse front (_cell_keys), then counts
    uniques by sort+boundary — no encoder, no payloads, so probing a batch
    of frames costs two sorts per frame.  Used by the pipeline's
    ``model.max_unique_per_frame=auto`` width sizing (round-4 item 2)."""
    inside, cell, mcode, _ = _cell_keys(pts_w, valid, bound_min, bound_max,
                                        voxel_size, n_xyz, n_vox)
    cell_s, mcode_s = jax.lax.sort((cell, mcode), num_keys=2)
    prev_c = jnp.concatenate([jnp.full((1,), -1, cell_s.dtype), cell_s[:-1]])
    prev_m = jnp.concatenate([jnp.full((1,), -1, mcode_s.dtype),
                              mcode_s[:-1]])
    new_g = ((cell_s != prev_c) | (mcode_s != prev_m)) & (cell_s < n_vox)
    n_groups = jnp.sum(new_g).astype(jnp.int32)

    s0 = n_xyz[1] * n_xyz[2]
    s1 = n_xyz[2]
    mi = jnp.stack([(mcode >> 2) & 1, (mcode >> 1) & 1, mcode & 1], axis=-1)
    pattern = jnp.asarray(voxel._CORNER_PATTERN)            # [8,3]
    offs = pattern[None, :, :] * mi[:, None, :]             # [N,8,3]
    ck = cell[:, None] + offs[..., 0] * s0 + offs[..., 1] * s1 + offs[..., 2]
    ck = jnp.where(inside[:, None], ck, n_vox).reshape(-1)
    ck_s = jax.lax.sort(ck)
    prev = jnp.concatenate([jnp.full((1,), -1, ck_s.dtype), ck_s[:-1]])
    n_corners = jnp.sum((ck_s != prev) & (ck_s < n_vox)).astype(jnp.int32)
    return n_groups, n_corners


def _cellsort_sort1(pts_w, normals, valid, bound_min, bound_max, voxel_size,
                    n_xyz, n_vox, sort1_gather: bool = False):
    """Stage-1 front: bound mask + cell keys + the point sort.

    ``sort1_gather`` sorts (cell, mcode, row index) — 3 operands instead
    of 8 — then gathers the 6 float payload channels by the sorted index
    (bit-identical: lax.sort is stable and the gather reproduces the same
    rows).  Whether the smaller sort + one gather beats carrying the
    payloads through the sort network is hardware-dependent; the flag
    exists to measure it (model.fuse_sort1_gather).

    Returns (cell_s, mcode_s, coords_s, normals_s, n_valid) — one frame."""
    inside, cell, mcode, coords = _cell_keys(
        pts_w, valid, bound_min, bound_max, voxel_size, n_xyz, n_vox)
    coords_z = jnp.where(inside[:, None], coords, 0.0)
    normals_z = jnp.where(inside[:, None], normals, 0.0)
    if sort1_gather:
        idx = jax.lax.broadcasted_iota(jnp.int32, (cell.shape[0], 1), 0)[:, 0]
        cell_s, mcode_s, idx_s = jax.lax.sort((cell, mcode, idx), num_keys=2)
        return (cell_s, mcode_s, coords_z[idx_s], normals_z[idx_s],
                jnp.sum(inside.astype(jnp.float32)))
    ops = jax.lax.sort(
        (cell, mcode, coords_z[:, 0], coords_z[:, 1], coords_z[:, 2],
         normals_z[:, 0], normals_z[:, 1], normals_z[:, 2]), num_keys=2)
    return (ops[0], ops[1], jnp.stack(ops[2:5], axis=-1),
            jnp.stack(ops[5:8], axis=-1),
            jnp.sum(inside.astype(jnp.float32)))


def _encode_sorted_fm(params, coords_s, normals_s, entry_valid,
                      compute_dtype):
    """Encoder over the sorted points, FEATURE-MAJOR output [F*8, N] with
    channel order (feature-major, corner-minor: channel = f*8 + p).

    That order makes the [F, 8, N] -> [F*8, N] step a plain reshape — no
    78 MB relayout between the encoder and the segmented-reduce kernel
    (bnv_fusion_tpu.kernels.seg_reduce wants rows on the lane axis).  The
    encoder input is likewise BUILT feature-major (pattern select over
    transposed [3, N] coords), so the only relayouts are two [N, 3]
    transposes (~4 MB)."""
    n = coords_s.shape[0]
    coordsT = coords_s.T                                # [3, N]
    normalsT = normals_s.T                              # [3, N]
    fl = jnp.floor(coordsT)
    ce = jnp.ceil(coordsT)
    patb = jnp.asarray(voxel._CORNER_PATTERN).T.astype(bool)[:, :, None]
    corT = jnp.where(patb, ce[:, None, :], fl[:, None, :])   # [3, 8, N]
    relT = coordsT[:, None, :] - corT                   # == local_offsets
    nrmT = jnp.broadcast_to(normalsT[:, None, :], relT.shape)
    xT = jnp.concatenate([relT, nrmT], axis=0).reshape(6, 8 * n)  # p-major
    enc = params["encoder"]
    n_hidden = sum(1 for k in enc if k.startswith("w") and k != "w_out")
    h = xT.astype(compute_dtype)
    for i in range(n_hidden):
        w = enc[f"w{i}"].astype(compute_dtype)
        h = jnp.dot(w.T, h, preferred_element_type=jnp.float32)
        h = h + enc[f"b{i}"][:, None]
        h = jnp.maximum(h, 0.0).astype(compute_dtype)
    out = jnp.dot(enc["w_out"].astype(compute_dtype).T, h,
                  preferred_element_type=jnp.float32) + \
        enc["b_out"][:, None]                           # [F, 8N]
    fdim = out.shape[0]
    out = jnp.where(entry_valid[None, None, :], out.reshape(fdim, 8, n), 0.0)
    return out.reshape(fdim * 8, n)                     # channel = f*8 + p


def _cellsort_reduce_batched(params, pts_w, normals, valid, bound_min,
                             bound_max, voxel_size, compute_dtype,
                             max_unique, max_unique_cells, n_xyz, n_vox,
                             fdim, interpret: bool = False,
                             seg_tile: int = 2048,
                             sort_bf16: bool = False,
                             sort1_gather: bool = False):
    """K-frame batched _cellsort_reduce with the Pallas segmented-reduce
    kernel replacing both cumsum+compaction-sort reductions.

    Motivation (v5e, round 3): a pallas_call costs ~4 ms FIXED on the
    tunneled runtime regardless of size, so per-frame kernels lose — but
    the kernel's actual reduction work is 3-4x cheaper than the XLA
    cumsum/sort path.  Batching the K frames of one launch into a single
    kernel call amortizes the fixed cost to ~0.5 ms/frame.

    Inputs are [K, N, ...]; returns the same tuple as
    jax.vmap(_cellsort_reduce) — semantics identical up to f32 summation
    order (the kernel sums segments directly instead of the mean-centered
    cumsum trick, which is strictly more accurate).
    """
    from bnv_fusion_tpu.kernels.seg_reduce import seg_reduce_sorted

    kf, n = pts_w.shape[:2]
    u_cell = min(max_unique_cells if max_unique_cells else max_unique, n)
    sent = int(n_vox)

    cell_s, mcode_s, coords_s, normals_s, n_valid = jax.vmap(
        partial(_cellsort_sort1, sort1_gather=sort1_gather),
        in_axes=(0, 0, 0, None, None, None, None, None))(
            pts_w, normals, valid, bound_min, bound_max, voxel_size,
            n_xyz, n_vox)
    entry_valid = cell_s < n_vox                        # [K, N]
    f8fm = jax.vmap(_encode_sorted_fm, in_axes=(None, 0, 0, 0, None))(
        params, coords_s, normals_s, entry_valid, compute_dtype)  # [K,8F,N]

    cnts1 = entry_valid.astype(jnp.int32)[:, None, :]   # [K, 1, N]
    cell_u, mcode_u, gcnt_i, gsum, n_groups = seg_reduce_sorted(
        cell_s, cnts1, f8fm, u=u_cell, sent=sent, keys2=mcode_s,
        two_keys=True, tile=seg_tile, interpret=interpret)
    gmask = jnp.arange(u_cell)[None, :] < \
        jnp.minimum(n_groups, u_cell)[:, None]          # [K, u_cell]
    gcnt = gcnt_i[..., 0]                               # [K, u_cell] int32
    cells_dropped = jnp.maximum(n_groups - u_cell, 0)

    # ---- stage 2: scatter per-cell partials to the 8 corner voxel ids ----
    s0 = n_xyz[1] * n_xyz[2]
    s1 = n_xyz[2]
    pattern = jnp.asarray(voxel._CORNER_PATTERN)        # [8, 3]
    moff = jnp.stack([(mcode_u >> 2) & 1, (mcode_u >> 1) & 1, mcode_u & 1],
                     axis=-1)                           # [K, u_cell, 3]
    offs = pattern[None, None, :, :] * moff[:, :, None, :]
    ckey = cell_u[:, :, None] + offs[..., 0] * s0 + offs[..., 1] * s1 + \
        offs[..., 2]                                    # [K, u_cell, 8]
    ckey = jnp.where(gmask[:, :, None], ckey, n_vox)
    m2 = u_cell * 8
    ck = ckey.reshape(kf, m2)
    # gsum channels are (f*8 + p); slice per-feature [K, u_cell, 8] planes
    g3 = jnp.where(gmask[:, :, None, None],
                   gsum.reshape(kf, u_cell, fdim, 8), 0.0)
    fch = [g3[:, :, j, :].reshape(kf, m2) for j in range(fdim)]
    c2 = jnp.where(gmask[:, :, None],
                   jnp.broadcast_to(gcnt[:, :, None], (kf, u_cell, 8)),
                   0).reshape(kf, m2)

    if sort_bf16:
        # halve the stage-2 sort's payload traffic: per-cell partial sums
        # quantize to bfloat16 (~0.4% of their std) and ride PACKED as
        # int32 pairs — 6 sort operands instead of 10.  model.fuse_sort_bf16
        # opts in (off by default; quality impact measured in RESULTS.md).
        def pack(a, b):
            au = jax.lax.bitcast_convert_type(
                a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
            bu = jax.lax.bitcast_convert_type(
                b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
            return jax.lax.bitcast_convert_type(au | (bu << 16), jnp.int32)

        packed = [pack(fch[2 * j], fch[2 * j + 1])
                  for j in range(fdim // 2)]
        ops2 = jax.vmap(lambda k, c, *p: jax.lax.sort((k,) + p + (c,),
                                                      num_keys=1))(
            ck, c2, *packed)
        ck_s = ops2[0]

        def unpack(p):
            u = jax.lax.bitcast_convert_type(p, jnp.uint32)
            lo = jax.lax.bitcast_convert_type(
                (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
            hi = jax.lax.bitcast_convert_type(
                (u >> 16).astype(jnp.uint16), jnp.bfloat16)
            return lo.astype(jnp.float32), hi.astype(jnp.float32)

        f2_list = []
        for p in ops2[1:1 + fdim // 2]:
            lo, hi = unpack(p)
            f2_list += [lo, hi]
        f2_s = jnp.stack(f2_list, axis=1)               # [K, F, m2]
        c2_s = ops2[-1][:, None, :]
    else:
        ops2 = jax.vmap(lambda k, c, *f: jax.lax.sort((k,) + f + (c,),
                                                      num_keys=1))(
            ck, c2, *fch)
        ck_s = ops2[0]
        f2_s = jnp.stack(ops2[1:1 + fdim], axis=1)      # [K, F, m2]
        c2_s = ops2[-1][:, None, :]                     # [K, 1, m2]

    u = min(max_unique, m2)
    flat_u, _, cnt_i, sum_u, n_unique = seg_reduce_sorted(
        ck_s, c2_s, f2_s, u=u, sent=sent, tile=seg_tile,
        interpret=interpret)
    umask = jnp.arange(u)[None, :] < jnp.minimum(n_unique, u)[:, None]
    cnt_u = cnt_i[..., 0].astype(jnp.float32)
    return (flat_u, cnt_u, sum_u, umask, n_unique, u, cells_dropped,
            n_valid)


def fuse_frames_merged(table, params: Dict[str, Any],
                       pts_w: jnp.ndarray, normals: jnp.ndarray,
                       valid: jnp.ndarray, bound_min: jnp.ndarray,
                       bound_max: jnp.ndarray, voxel_size: float,
                       min_pts_in_grid: int, compute_dtype=jnp.float32,
                       max_unique: int = 1 << 17,
                       max_unique_cells: int | None = None,
                       max_unique_batch: int | None = None,
                       seg_kernel: bool | str = False,
                       sort_bf16: bool = False,
                       sort1_gather: bool = False,
                       front_chunks: int = 1):
    """Fuse K frames with ONE table update (the batched-launch fast path).

    ``seg_kernel`` routes the two segment reductions through the batched
    Pallas kernel (_cellsort_reduce_batched; "interpret" for CPU tests);
    ``sort_bf16`` packs the stage-2 sort payload as bf16 pairs;
    ``sort1_gather`` sorts stage 1 by (cell, mcode, index) and gathers the
    float payloads (bit-identical; a measurement knob).

    ``front_chunks`` > 1 runs the per-frame reduce FRONT as a lax.scan over
    K/front_chunks-frame sub-batches instead of one K-wide batch — the
    memory diet that fits K=32 in HBM (the front's live intermediates are
    the encoder activations + sort payloads, ~0.6 GB/frame at 480x640; the
    cross-frame merge + single table update still span the full K, so the
    per-batch costs amortize over 2x the frames; the Pallas seg-reduce
    kernel fires once per SUB-batch, same per-frame call cost as K=16).
    Per-frame results are bit-identical to front_chunks=1 (the front is
    frame-independent).

    The per-frame running mean (reference local_point_fusion.py:647-673) is
    associative: folding frames i..j into old state equals one update with
    W = sum(nw_i) and S = sum(nw_i * mean_i).  Per-frame reductions (bound
    mask, encoding, min-pts filter, per-frame weights) run under vmap with
    semantics identical to fuse_frame_cellsort; a cross-frame merge sort
    then combines per-voxel contributions so the scatter-heavy insert +
    running-mean update — measured 17 ms/frame of the 42 ms cell-sort frame
    on v5e, the single largest cost — happens once per K-frame batch
    instead of once per frame.

    Returns (table, FrameStats with [K]-shaped leaves)."""
    kf = pts_w.shape[0]
    fdim = table.feat_dims
    n_xyz = table.n_xyz
    n_vox = (table.n_voxels if hasattr(table, "n_voxels")
             else table.slot_map.shape[0])

    def front_batch(p, nr, v):
        """Reduce front over one [k, N] frame sub-batch -> array leaves only
        (the static width ``u`` is recovered from shapes afterwards)."""
        if seg_kernel:
            (flat_u, cnt_u, sum_u, umask, n_unique, _, cells_dropped,
             n_valid) = _cellsort_reduce_batched(
                params, p, nr, v, bound_min, bound_max,
                voxel_size, compute_dtype, max_unique, max_unique_cells,
                n_xyz, n_vox, fdim, interpret=(seg_kernel == "interpret"),
                sort_bf16=sort_bf16, sort1_gather=sort1_gather)
        else:
            def reduce_one(pp, nn, vv):
                return _cellsort_reduce(params, pp, nn, vv, bound_min,
                                        bound_max, voxel_size, compute_dtype,
                                        max_unique, max_unique_cells, n_xyz,
                                        n_vox, fdim,
                                        sort1_gather=sort1_gather)

            (flat_u, cnt_u, sum_u, umask, n_unique, _, cells_dropped,
             n_valid) = jax.vmap(reduce_one)(p, nr, v)  # [k, U, ..]
        return flat_u, cnt_u, sum_u, umask, n_unique, cells_dropped, n_valid

    if front_chunks > 1:
        if kf % front_chunks:
            raise ValueError(f"front_chunks={front_chunks} must divide the "
                             f"batch size {kf}")
        kc = kf // front_chunks

        def body(_, inp):
            return 0, front_batch(*inp)

        xs = tuple(x.reshape((front_chunks, kc) + x.shape[1:])
                   for x in (pts_w, normals, valid))
        _, outs = jax.lax.scan(body, 0, xs)
        (flat_u, cnt_u, sum_u, umask, n_unique, cells_dropped,
         n_valid) = tuple(x.reshape((kf,) + x.shape[2:]) for x in outs)
    else:
        (flat_u, cnt_u, sum_u, umask, n_unique, cells_dropped,
         n_valid) = front_batch(pts_w, normals, valid)
    u = flat_u.shape[1]

    # per-frame reference weighting + min-pts filter (pre-merge, exactly as
    # the sequential path applies them)
    mean_u = sum_u / jnp.maximum(cnt_u, 1.0)[..., None]
    nw = jnp.minimum(cnt_u / 32.0, 1.0)
    keep = umask & (cnt_u >= min_pts_in_grid)

    m3 = kf * u
    # every unique voxel enters the merge — sub-min-pts voxels still claim a
    # slot with zero weight, matching the sequential path's allocation —
    # but only keep entries carry weight/features/hits
    key = jnp.where(umask, flat_u, n_vox).reshape(m3)
    # nw = min(cnt/32, 1) is integer in units of 1/32 (cnt is an integer
    # count), so its cumsum rides int32 EXACTLY — a plain f32 cumsum over
    # ~1M entries reaches ~5e5 where ulp ~0.03 and would corrupt weights
    nw32 = jnp.where(keep, jnp.minimum(cnt_u, 32.0), 0.0) \
        .astype(jnp.int32).reshape(m3)
    h32 = keep.astype(jnp.int32).reshape(m3)
    s_z = jnp.where(keep[..., None], mean_u * nw[..., None],
                    0.0).reshape(m3, fdim)

    ops = jax.lax.sort(
        (key, nw32, h32) + tuple(s_z[:, j] for j in range(fdim)), num_keys=1)
    key_s, nw_s, h_s = ops[0], ops[1], ops[2]
    s_s = jnp.stack(ops[3:], axis=-1)

    prev = jnp.concatenate([jnp.full((1,), -1, key_s.dtype), key_s[:-1]])
    bnd = key_s != prev
    ev = key_s < n_vox
    wcum = jnp.cumsum(nw_s)                       # int32, exact
    hcum = jnp.cumsum(h_s)                        # int32, exact
    nxt = jnp.concatenate([bnd[1:], jnp.ones((1,), bool)])
    is_end = nxt & ev
    n_uniq_b = jnp.sum(is_end).astype(jnp.int32)

    ub = min(max_unique_batch if max_unique_batch else 2 * max_unique, m3)
    idx = jax.lax.broadcasted_iota(jnp.int32, (m3, 1), 0)[:, 0]
    end = jax.lax.sort(jnp.where(is_end, idx, m3))[:ub]
    end = jnp.minimum(end, m3 - 1)
    bmask = jnp.arange(ub) < jnp.minimum(n_uniq_b, ub)
    pend = jnp.concatenate([jnp.full((1,), -1, end.dtype), end[:-1]])
    flat_b = key_s[end]
    wlo = jnp.where(pend >= 0, wcum[jnp.maximum(pend, 0)], 0)
    W = (wcum[end] - wlo).astype(jnp.float32) / 32.0   # [UB] exact
    hlo = jnp.where(pend >= 0, hcum[jnp.maximum(pend, 0)], 0)
    H = (hcum[end] - hlo).astype(jnp.float32)   # frames with a real obs
    # feature sums: a voxel appears at most ONCE PER FRAME, so every merge
    # segment has <= K entries — sum them with K shifted gathers (exact f32
    # accumulation; a global mean-centered cumsum leaves ~1e-4 cancellation
    # noise that division by weights as small as 1/32 amplifies to ~3e-3)
    seg_len = (end - pend).astype(jnp.int32)
    S = jnp.zeros((ub, fdim), jnp.float32)
    for i in range(kf):
        take = jnp.maximum(end - i, 0)
        S = S + jnp.where((i < seg_len)[:, None], s_s[take], 0.0)

    table, slots, ok = tbl.insert_unique_flat(
        table, jnp.where(bmask, flat_b, -1), bmask)
    dropped = jnp.maximum(n_uniq_b - ub, 0)

    # only voxels that accumulated real weight update values (sequential
    # parity: sub-min-pts voxels keep zero weight/features in their slot)
    keep_b = bmask & ok & (W > 0)
    old_w = jnp.where(keep_b, table.weights[slots], 0.0)
    old_f = jnp.where(keep_b[:, None], table.features[slots], 0.0)
    old_h = jnp.where(keep_b, table.num_hits[slots], 0.0)
    upd_w = old_w + W
    upd_f = (old_f * old_w[:, None] + S) / \
        jnp.maximum(upd_w, 1e-12)[:, None]

    widx = jnp.where(keep_b, slots, table.capacity)
    features = table.features.at[widx].set(upd_f, mode="drop",
                                           unique_indices=True)
    weights = table.weights.at[widx].set(upd_w, mode="drop",
                                         unique_indices=True)
    num_hits = table.num_hits.at[widx].set(old_h + H, mode="drop",
                                           unique_indices=True)
    per_frame_dropped = jnp.sum(jnp.maximum(n_unique - u, 0))
    table = table.replace(
        features=features, weights=weights, num_hits=num_hits,
        overflow=table.overflow + dropped.astype(jnp.int32) +
        jnp.sum(cells_dropped).astype(jnp.int32) +
        per_frame_dropped.astype(jnp.int32))

    nf = jnp.maximum(n_unique.astype(jnp.float32), 1.0)
    stats = FrameStats(
        n_avg_pts=jnp.sum(jnp.where(umask, cnt_u, 0.0), axis=1) / nf,
        n_touched=n_unique.astype(jnp.float32),
        n_valid_pts=n_valid,
    )
    return table, stats


def make_fuse_frame_fn(voxel_size: float, min_pts_in_grid: int,
                       compute_dtype=jnp.float32, donate: bool = True):
    """Build the jitted per-frame fusion step (table buffers donated)."""
    fn = partial(fuse_frame, voxel_size=voxel_size,
                 min_pts_in_grid=min_pts_in_grid, compute_dtype=compute_dtype)

    def step(table, params, pts_w, normals, valid, bound_min, bound_max):
        return fn(table, params, pts_w, normals, valid, bound_min, bound_max)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# SDF decode through the sparse volume (the global-fusion / meshing hot path)
# ---------------------------------------------------------------------------

def decode_points(features: jnp.ndarray, table: tbl.AnyTable,
                  params: Dict[str, Any], pts: jnp.ndarray,
                  bound_min: jnp.ndarray, voxel_size: float,
                  min_pts_in_grid: int,
                  sdf_delta: jnp.ndarray | None = None,
                  n_xyz: jnp.ndarray | None = None,
                  is_coords: bool = False,
                  compute_dtype=jnp.float32,
                  use_fused_kernel: bool = False,
                  masked_fill: float | None = None,
                  layout: str = "rows") -> jnp.ndarray:
    """SDF at world points (or voxel coords) via 8-corner decode + blend.

    Rebuilds SparseVolume.decode_pts (reference
    src/models/sparse_volume.py:768-833): gather corner latents, positional-
    encode the local offsets, run the decoder MLP per corner, blend with
    normalized trilinear weights, mask voxels whose corners haven't
    accumulated min_pts weight (masked SDF = +voxel_size), optionally add the
    nearest-sampled dense TSDF prior.

    ``features`` is passed separately from the table so the global
    optimization can differentiate w.r.t. it while the table supplies
    key/weight structure.  Returns [M] SDF values.
    """
    from bnv_fusion_tpu import table_blocks as _blocks
    from bnv_fusion_tpu import table_dense as _dense

    if layout == "fm" and isinstance(
            table, (_dense.DenseIndexedTable, _blocks.BlockIndexedTable)) \
            and not use_fused_kernel:
        return decode_points_fm(features, table, params, pts, bound_min,
                                voxel_size, min_pts_in_grid,
                                sdf_delta=sdf_delta, n_xyz=n_xyz,
                                is_coords=is_coords,
                                compute_dtype=compute_dtype,
                                masked_fill=masked_fill)
    if not is_coords:
        coords = voxel.position_to_coords(pts, bound_min, voxel_size)
    else:
        coords = pts
    corners = voxel.corner_neighbors(coords)               # [M,8,3]
    tw = voxel.trilinear_weights(coords, corners)          # [M,8]
    local = voxel.local_offsets(coords, corners)           # [M,8,3]

    m = coords.shape[0]
    slots, found = tbl.lookup(table, corners.reshape(m * 8, 3))
    feats = jnp.where(found[:, None], features[slots], 0.0)
    w = jnp.where(found, table.weights[slots], 0.0)
    feats = feats.reshape(m, 8, -1)
    w = w.reshape(m, 8)

    if use_fused_kernel and m % 1024 == 0:
        # Pallas fused PE+MLP+blend (inference only — meshing); the
        # optimization loss keeps the XLA path for autodiff
        from bnv_fusion_tpu.kernels import fused_corner_decode

        sdf = fused_corner_decode(params, local, feats, tw, voxel_size)
    else:
        alpha = bnn.decoder_apply(params, local, feats,
                                  compute_dtype=compute_dtype)[..., 0]
        alpha = alpha * voxel_size
        sdf = jnp.sum(alpha * tw, axis=-1)

    # all 8 corners must carry at least min_pts weight (sparse_volume.py:809)
    # masked fallback +voxel_size matches the reference; meshing passes
    # masked_fill=nan so unobserved cells can be dropped instead of
    # hallucinating walls at the observed/unobserved boundary
    mask = jnp.min(w, axis=-1) >= min_pts_in_grid
    fill = voxel_size if masked_fill is None else masked_fill
    sdf = jnp.where(mask, sdf, fill)

    if sdf_delta is not None:
        delta = _sample_delta_nearest(sdf_delta, corners, n_xyz)   # [M,8]
        sdf = sdf + jnp.sum(delta * tw, axis=-1)
    return sdf


class DecodePrep(NamedTuple):
    """Feature-independent precomputation of a decode batch (see
    decode_prepare/decode_eval)."""

    slots: jnp.ndarray      # [8M] gather rows into features/weights
    found: jnp.ndarray      # [8M]
    tw: jnp.ndarray         # [M, 8] trilinear blend weights
    local: jnp.ndarray      # [M, 8, 3] corner-local offsets
    w: jnp.ndarray          # [M, 8] decode-mask weights
    delta: jnp.ndarray | None   # [M, 8] prior samples (already weighted)
    corners: jnp.ndarray    # [M, 8, 3] int corner coords (for count_optim)


def decode_prepare(table: tbl.AnyTable, pts: jnp.ndarray,
                   bound_min: jnp.ndarray, voxel_size: float,
                   sdf_delta: jnp.ndarray | None = None,
                   n_xyz: jnp.ndarray | None = None,
                   is_coords: bool = False) -> DecodePrep:
    """Everything decode_points computes EXCEPT the feature-dependent part.

    Splitting lets the optimization differentiate w.r.t. the GATHERED
    feature rows instead of the full [capacity, F] array: the backward then
    yields sparse cotangent rows, and the caller applies ONE scatter-add
    per iteration instead of a dense [capacity, F] accumulation per chunk
    (profiled at 12 ms/chunk on v5e — the optimize loop's largest cost).
    """
    if not is_coords:
        coords = voxel.position_to_coords(pts, bound_min, voxel_size)
    else:
        coords = pts
    corners = voxel.corner_neighbors(coords)
    tw = voxel.trilinear_weights(coords, corners)
    local = voxel.local_offsets(coords, corners)
    m = coords.shape[0]
    slots, found = tbl.lookup(table, corners.reshape(m * 8, 3))
    w = jnp.where(found, table.weights[slots], 0.0).reshape(m, 8)
    delta = (None if sdf_delta is None
             else _sample_delta_nearest(sdf_delta, corners, n_xyz))
    return DecodePrep(slots=slots, found=found, tw=tw, local=local, w=w,
                      delta=delta, corners=corners)


def decode_eval(gathered_feats: jnp.ndarray, prep: DecodePrep,
                params: Dict[str, Any], voxel_size: float,
                min_pts_in_grid: int, compute_dtype=jnp.float32,
                masked_fill: float | None = None) -> jnp.ndarray:
    """Feature-dependent tail of decode_points.

    ``decode_eval(features[prep.slots], prep, ...)`` equals
    ``decode_points(features, ...)`` exactly; differentiating w.r.t.
    ``gathered_feats`` yields per-row cotangents.
    """
    m = prep.tw.shape[0]
    feats = jnp.where(prep.found[:, None], gathered_feats,
                      0.0).reshape(m, 8, -1)
    alpha = bnn.decoder_apply(params, prep.local, feats,
                              compute_dtype=compute_dtype)[..., 0]
    sdf = jnp.sum(alpha * voxel_size * prep.tw, axis=-1)
    mask = jnp.min(prep.w, axis=-1) >= min_pts_in_grid
    fill = voxel_size if masked_fill is None else masked_fill
    sdf = jnp.where(mask, sdf, fill)
    if prep.delta is not None:
        sdf = sdf + jnp.sum(prep.delta * prep.tw, axis=-1)
    return sdf


def decode_points_fm(features: jnp.ndarray, table: tbl.AnyTable,
                     params: Dict[str, Any], pts: jnp.ndarray,
                     bound_min: jnp.ndarray, voxel_size: float,
                     min_pts_in_grid: int,
                     sdf_delta: jnp.ndarray | None = None,
                     n_xyz: jnp.ndarray | None = None,
                     is_coords: bool = False,
                     compute_dtype=jnp.float32,
                     masked_fill: float | None = None) -> jnp.ndarray:
    """decode_points with FEATURE-MAJOR internals (slot-map tables only).

    Numerically the same contract as decode_points, laid out so every
    intermediate keeps the POINT dimension on the 128-lane axis: the
    row-major form materializes [M, 8]/[M, 8, 3] arrays whose minor dims
    pad to 128 lanes, and that padding tax — not gather latency — was
    measured to dominate the optimization forward (RESULTS.md, round-2
    render profile).  One padded materialization remains (the [8M, F]
    feature row gather, transposed once); everything else is dense.

    Differentiable w.r.t. ``features`` (the gather/transpose backward is
    the same scatter-add as the row-major form).
    """
    from bnv_fusion_tpu import table_blocks as _blocks
    from bnv_fusion_tpu import table_dense as _dense

    m = pts.shape[0]
    ptsT = pts.T                                        # [3, M]
    if not is_coords:
        coordsT = (ptsT - bound_min[:, None]) / voxel_size
    else:
        coordsT = ptsT
    fl = jnp.floor(coordsT)
    ce = jnp.ceil(coordsT)
    pat = jnp.asarray(voxel._CORNER_PATTERN)            # [8, 3]
    patb = pat.astype(bool)[:, :, None]                 # [8, 3, 1]
    corT = jnp.where(patb, ce[None], fl[None])          # [8, 3, M] float
    localT = coordsT[None] - corT                       # [8, 3, M]
    w8 = jnp.prod(1.0 - jnp.abs(localT), axis=1)        # [8, M]
    tw = w8 / jnp.maximum(jnp.sum(w8, axis=0, keepdims=True), 1e-12)

    cor_i = corT.astype(jnp.int32)
    nx = table.n_xyz
    inside = ((cor_i[:, 0] >= 0) & (cor_i[:, 0] < nx[0]) &
              (cor_i[:, 1] >= 0) & (cor_i[:, 1] < nx[1]) &
              (cor_i[:, 2] >= 0) & (cor_i[:, 2] < nx[2]))  # [8, M]
    mod = (_dense if isinstance(table, _dense.DenseIndexedTable)
           else _blocks)
    slots, found = mod.lookup_coords3(
        table, cor_i[:, 0], cor_i[:, 1], cor_i[:, 2], inside)  # [8, M]

    flat_slots = slots.reshape(8 * m)                   # k-major
    foundf = found.reshape(8 * m)
    w = jnp.where(foundf, table.weights[flat_slots], 0.0).reshape(8, m)
    # the one padded intermediate: row gather [8M, F], transposed once
    featsT = jnp.where(foundf[None, :],
                       features[flat_slots].T, 0.0)     # [F, 8M]

    # PE(local) feature-major: channel order [xyz, sin(xyz), cos(xyz)];
    # transpose(1,0,2) -> [3, 8, M], reshaped [3, 8M] matches the k-major
    # order of flat_slots
    local_c = localT.transpose(1, 0, 2).reshape(3, 8 * m)
    pe = jnp.concatenate([local_c, jnp.sin(local_c), jnp.cos(local_c)],
                         axis=0)                        # [9, 8M]
    x = jnp.concatenate([pe, featsT.astype(pe.dtype)], axis=0)  # [9+F, 8M]

    dec = params["decoder"]
    n_hidden = sum(1 for k in dec if k.startswith("w") and k != "w_out")
    h = x.astype(compute_dtype)
    for i in range(n_hidden):
        wgt = dec[f"w{i}"].astype(compute_dtype)
        h = jnp.dot(wgt.T, h, preferred_element_type=jnp.float32)
        h = h + dec[f"b{i}"][:, None]
        h = jnp.maximum(h, 0.0).astype(compute_dtype)
    alpha = jnp.dot(dec["w_out"].astype(compute_dtype).T, h,
                    preferred_element_type=jnp.float32) + \
        dec["b_out"][:, None]                           # [1, 8M]
    alpha = alpha.reshape(8, m) * voxel_size
    sdf = jnp.sum(alpha * tw, axis=0)                   # [M]

    mask = jnp.min(w, axis=0) >= min_pts_in_grid
    fill = voxel_size if masked_fill is None else masked_fill
    sdf = jnp.where(mask, sdf, fill)

    if sdf_delta is not None:
        dx, dy, dz = sdf_delta.shape
        dims = jnp.asarray([dx, dy, dz], jnp.float32)
        nxf = n_xyz.astype(jnp.float32)
        u = corT / (nxf[None, :, None] - 1.0)           # [8, 3, M]
        idx = jnp.round(u * (dims[None, :, None] - 1.0)).astype(jnp.int32)
        din = ((idx[:, 0] >= 0) & (idx[:, 0] < dx) &
               (idx[:, 1] >= 0) & (idx[:, 1] < dy) &
               (idx[:, 2] >= 0) & (idx[:, 2] < dz))
        ix = jnp.clip(idx[:, 0], 0, dx - 1)
        iy = jnp.clip(idx[:, 1], 0, dy - 1)
        iz = jnp.clip(idx[:, 2], 0, dz - 1)
        dflat = (ix * dy + iy) * dz + iz                # [8, M]
        vals = sdf_delta.reshape(-1)[dflat.reshape(-1)].reshape(8, m)
        delta = jnp.where(din, vals, 0.0)
        sdf = sdf + jnp.sum(delta * tw, axis=0)
    return sdf


def _sample_delta_nearest(sdf_delta: jnp.ndarray, corners: jnp.ndarray,
                          n_xyz: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample of the dense prior at fine-grid corner coords.

    Replicates F.grid_sample(mode="nearest", align_corners=True,
    padding_mode="zeros") over coords normalized by (n_xyz - 1)
    (reference src/models/sparse_volume.py:819-832): the prior volume has its
    own resolution; normalized coords span the common world box.
    """
    dx, dy, dz = sdf_delta.shape
    dims = jnp.asarray([dx, dy, dz], jnp.float32)
    u = corners.astype(jnp.float32) / (n_xyz.astype(jnp.float32) - 1.0)
    idx = jnp.round(u * (dims - 1.0)).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < jnp.asarray([dx, dy, dz])), axis=-1)
    idx = jnp.clip(idx, 0, jnp.asarray([dx - 1, dy - 1, dz - 1]))
    # flattened 1-D gather (multi-dim gathers lower poorly on v5e)
    flat = (idx[..., 0] * (dy * dz) + idx[..., 1] * dz + idx[..., 2])
    vals = sdf_delta.reshape(-1)[flat.reshape(-1)].reshape(flat.shape)
    return jnp.where(inside, vals, 0.0)


def scatter_add_rows(gidx: jnp.ndarray, rows: jnp.ndarray, capacity: int,
                     method: str = "sortreduce",
                     unique_budget: int | None = None) -> jnp.ndarray:
    """Accumulate [N, F] rows into a fresh [capacity, F] array by index.

    ``gidx == capacity`` marks dropped rows.  Two methods:

    * "scatter" — ``zeros.at[gidx].add(rows, mode=drop)``.  XLA's scatter
      is row-serialized: measured 26.8 ms for 640k x 8 rows into [2.1M, 8]
      on v5e (~82 ns/scalar), HALF of the tuned optimize iteration
      (probe_grad_scatter.py round 5; pre-sorting, segment_sum, 1-channel
      splits, and carried-buffer variants all measured equal or worse).
    * "sortreduce" (default) — the fusion pipeline's pattern: sort rows by
      index, per-channel cumsum, windowed segment sums at compacted
      boundaries, then ONE scatter of the unique rows.  13.7 ms at the
      same point.  The summation order inside a segment changes (cumsum
      difference vs scatter order), a float-reassociation-only deviation —
      XLA's scatter-add order over duplicates is itself unspecified, so
      neither order is canonical; quality-gated end to end.

    ``unique_budget`` caps the compacted boundary count (default N // 4,
    ~2.7x headroom over the distinct-voxel counts measured at the bench
    point); if a batch ever exceeds it, a lax.cond falls back to the
    exact plain scatter — never a silent gradient drop.
    """
    n, fdim = rows.shape
    if method == "scatter":
        return jnp.zeros((capacity, fdim), rows.dtype).at[gidx].add(
            rows, mode="drop")
    ub = min(unique_budget or max(n // 4, 1 << 14), n)
    ops = jax.lax.sort((gidx,) + tuple(rows[:, j] for j in range(fdim)),
                       num_keys=1)
    k = ops[0]
    csum = jnp.cumsum(jnp.stack(ops[1:], axis=-1), axis=0)
    is_end = jnp.concatenate([k[1:] != k[:-1], jnp.ones((1,), bool)])
    is_end = is_end & (k < capacity)
    n_uni = jnp.sum(is_end)

    def compacted(_):
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        endpos = jax.lax.sort(jnp.where(is_end, idx, n))[:ub]
        valid = endpos < n
        ec = jnp.minimum(endpos, n - 1)
        prev = jnp.concatenate([jnp.full((1,), -1, ec.dtype), ec[:-1]])
        sums = csum[ec] - jnp.where((prev >= 0)[:, None],
                                    csum[jnp.maximum(prev, 0)], 0.0)
        return jnp.zeros((capacity, fdim), rows.dtype).at[
            jnp.where(valid, k[ec], capacity)].add(sums, mode="drop")

    def fallback(_):
        return jnp.zeros((capacity, fdim), rows.dtype).at[gidx].add(
            rows, mode="drop")

    return jax.lax.cond(n_uni <= ub, compacted, fallback, operand=None)


def sdf_gradient(features: jnp.ndarray, table: tbl.AnyTable,
                 params: Dict[str, Any], pts: jnp.ndarray,
                 bound_min: jnp.ndarray, voxel_size: float,
                 min_pts_in_grid: int, normalize: bool = True,
                 **decode_kwargs) -> jnp.ndarray:
    """SDF spatial gradients (surface normals) at world points via autodiff.

    Rebuilds LitFusionPointNet.gradient (reference
    src/models/fusion/local_point_fusion.py:247-263), which backprops through
    the decode; here it is one jax.grad of decode_points w.r.t. the points.
    Returns [M, 3] (unit normals when ``normalize``).
    """
    def sdf_sum(p):
        return jnp.sum(decode_points(
            features, table, params, p, bound_min, voxel_size,
            min_pts_in_grid, **decode_kwargs))

    g = jax.grad(sdf_sum)(pts)
    if normalize:
        g = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-5)
    return g


def bump_optim_weights(table: tbl.AnyTable, corners: jnp.ndarray,
                       slots: jnp.ndarray | None = None,
                       found: jnp.ndarray | None = None) -> tbl.AnyTable:
    """+1 weight on voxels touched by optimization rays (once per call).

    Replicates SparseVolume.count_optim (reference
    src/models/sparse_volume.py:602-622), where duplicate torch indexed
    writes collapse to a single +1.

    ``slots``/``found``: pass decode_prepare's lookup result for the SAME
    corners to skip a second 8M-row slot-map lookup (measured ~4.7 ms/iter
    inside the bump at the tuned optimize point, probe_optim_ops round 5).
    Weights only ever GROW, so a slot resolved by the earlier lookup is
    still the right slot — the reuse is exact.
    """
    if slots is None or found is None:
        flat = corners.reshape(-1, 3)
        slots, found = tbl.lookup(table, flat)
    idx = jnp.where(found, slots, table.capacity)
    bump = jnp.zeros((table.capacity,), jnp.float32).at[idx].max(1.0, mode="drop")
    return table.replace(weights=table.weights + bump)
