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
from bnv_fusion_tpu import tables as tbl


def make_sharded_fuse_frame(mesh: Mesh, params: Dict[str, Any],
                            voxel_size: float, min_pts_in_grid: int,
                            example_table: tbl.AnyTable,
                            axis: str = "dp",
                            max_unique: int = 1 << 17,
                            max_unique_cells: int | None = None):
    """Jitted fuse step with points sharded over ``axis``.

    TPU-first collective layout: each chip runs the cell-keyed sort-reduce
    on ITS point shard (fusion._cellsort_reduce — the same kernel as the
    single-chip path), then the COMPACTED per-voxel partials
    (flat id, count, feature sum; [U] rows) are all-gathered and merged by
    one small sort, and the replicated insert + running-mean update applies
    once.  Compared to the earlier design (capacity-sized scatter-add
    accumulators psum-ed across chips), ICI traffic drops from
    2 x capacity x (F+1) floats per frame to D x U x (F+2) — and no
    capacity-wide scatters run at all.  min_pts filtering applies to the
    TOTAL per-voxel count after the merge (exact single-chip semantics).

    Only slot-map tables (dense/blocks) are supported — the same routing as
    the single-chip sort-reduce fast path.

    Signature: step(table, pts_w [N,3], normals [N,3], valid [N], bound_min,
    bound_max) -> (table, stats); N must divide the mesh size.
    """
    n_dev = int(mesh.devices.size)
    if not hasattr(example_table, "slot_map") and \
            not hasattr(example_table, "n_voxels"):
        raise ValueError(
            "sharded fusion requires a slot-map table (dense/blocks) — the "
            "same routing as the single-chip sort-reduce fast path")

    def local_fn(table, pts_w, normals, valid, bound_min, bound_max):
        fdim = table.feat_dims
        n_xyz = table.n_xyz
        n_vox = (table.n_voxels if hasattr(table, "n_voxels")
                 else table.slot_map.shape[0])
        (flat_u, cnt_u, sum_u, umask, n_unique, u, cells_dropped,
         n_valid) = fusion._cellsort_reduce(
            params, pts_w, normals, valid, bound_min, bound_max,
            voxel_size, jnp.float32, max_unique, max_unique_cells,
            n_xyz, n_vox, fdim)

        # gather every chip's compacted partials (identical on all chips
        # afterwards, so the table update below stays replicated)
        key = jnp.where(umask, flat_u, n_vox)
        keys_all = jax.lax.all_gather(key, axis)            # [D, U]
        cnt_all = jax.lax.all_gather(cnt_u, axis)
        sum_all = jax.lax.all_gather(sum_u, axis)
        m3 = n_dev * u
        ck = keys_all.reshape(m3)
        cc = cnt_all.reshape(m3).astype(jnp.int32)          # exact ints
        cs = sum_all.reshape(m3, fdim)
        ops = jax.lax.sort((ck, cc) + tuple(cs[:, j] for j in range(fdim)),
                           num_keys=1)
        ck_s, cc_s = ops[0], ops[1]
        cs_s = jnp.stack(ops[2:], axis=-1)

        prev = jnp.concatenate([jnp.full((1,), -1, ck_s.dtype), ck_s[:-1]])
        bnd = ck_s != prev
        ev = ck_s < n_vox
        ccum = jnp.cumsum(cc_s)                             # int32, exact
        nxt = jnp.concatenate([bnd[1:], jnp.ones((1,), bool)])
        is_end = nxt & ev
        n_uni = jnp.sum(is_end).astype(jnp.int32)

        ub = min(max_unique, m3)
        idx = jax.lax.broadcasted_iota(jnp.int32, (m3, 1), 0)[:, 0]
        end = jax.lax.sort(jnp.where(is_end, idx, m3))[:ub]
        end = jnp.minimum(end, m3 - 1)
        bmask = jnp.arange(ub) < jnp.minimum(n_uni, ub)
        pend = jnp.concatenate([jnp.full((1,), -1, end.dtype), end[:-1]])
        flat_b = ck_s[end]
        clo = jnp.where(pend >= 0, ccum[jnp.maximum(pend, 0)], 0)
        cnt_b = (ccum[end] - clo).astype(jnp.float32)
        # feature sums: a voxel appears at most once per chip, so merge
        # segments have <= D entries — exact windowed adds
        seg_len = (end - pend).astype(jnp.int32)
        S = jnp.zeros((ub, fdim), jnp.float32)
        for i in range(n_dev):
            take = jnp.maximum(end - i, 0)
            S = S + jnp.where((i < seg_len)[:, None], cs_s[take], 0.0)

        dropped_shard = jax.lax.psum(
            jnp.maximum(n_unique - u, 0) + cells_dropped, axis)
        table, stats = fusion._integrate_unique(
            table, flat_b, cnt_b, S, bmask, n_uni, ub, min_pts_in_grid,
            extra_overflow=dropped_shard.astype(jnp.int32))
        stats = stats._replace(n_valid_pts=jax.lax.psum(n_valid, axis))
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


def make_sharded_optimize_iter(mesh: Mesh, params: Dict[str, Any],
                               voxel_size: float, min_pts_in_grid: int,
                               truncated_units: int, truncated_dist: float,
                               ray_max_dist: float, n_rays: int,
                               train_ray_splits: int,
                               example_table: tbl.AnyTable,
                               lr: float = 1e-3,
                               neighbor_kernel: int = 3,
                               axis: str = "dp",
                               n_fine: int = 0, n_coarse: int = 0):
    """Ray-DP version of optimize.make_optimize_step's per-frame iteration —
    the drop-in sharded step NeuralMap.optimize uses when
    ``trainer.optimize_devices`` > 1 (VERDICT round-2 item 2).

    Semantics match the single-device step exactly (same ray sampling, same
    per-chunk masked mean, same sequential count_optim bump schedule, one
    Adam update per iteration): the chunk jitter uniforms are drawn ONCE
    with the same key structure and row-sharded, per-shard error/mask sums
    psum into the global masked mean, bumps combine with pmax, and the
    sparse cotangent rows scatter locally with one gradient psum per
    iteration.  Differences from single-device are float reduction order
    only.

    Signature: step(state, table, depth, T_wc, intr, bound_min, n_xyz,
    sdf_delta, key) -> (state, loss) — identical to the unsharded step.
    """
    from bnv_fusion_tpu import optimize as optmod

    if n_rays % train_ray_splits:
        raise ValueError("n_rays must be a multiple of train_ray_splits")
    n_chunks = n_rays // train_ray_splits
    n_dev = int(mesh.devices.size)
    if train_ray_splits % n_dev:
        raise ValueError(
            f"train_ray_splits={train_ray_splits} must divide over the "
            f"{n_dev}-device mesh")
    opt = optax.adam(lr)
    n_fine = n_fine or truncated_units * 2
    n_coarse = n_coarse or int(ray_max_dist * 5)

    def local_fn(features, weights, opt_state, table, chunk_arrays, ts_f,
                 ts_c, T_wc, intr, bound_min, n_xyz, sdf_delta, lr_scale):
        cap = features.shape[0]
        fdim = features.shape[1]

        def scan_body(w, inp):
            (uv, gt_pts, mask, npts, nmasks), tf, tc = inp
            chunk = render.Rays(uv=uv, gt_pts=gt_pts, mask=mask,
                                neighbor_pts=npts, neighbor_masks=nmasks,
                                T_wc=T_wc, intr=intr)
            t = table.replace(weights=w)
            prep, pts, cam_loc = render.prepare_render(
                t, chunk, None, bound_min, voxel_size, truncated_units,
                truncated_dist, ray_max_dist, sdf_delta, n_xyz,
                ts=(tf, tc), n_fine=n_fine, n_coarse=n_coarse)
            gfeats = features[prep.slots]

            def tail(gf):
                s, nv = render.eval_render_loss(
                    gf, prep, params, chunk, pts, cam_loc, voxel_size,
                    min_pts_in_grid, truncated_dist, reduce="sum")
                return s, nv

            (err_sum, n_valid), g_rows = jax.value_and_grad(
                tail, has_aux=True)(gfeats)
            denom = jax.lax.psum(n_valid, axis) + 1e-4
            loss = jax.lax.psum(err_sum, axis) / denom
            g_rows = g_rows / denom
            # count_optim: union across devices (pmax), sequential in
            # chunks; reuses prep's lookup (keys never change during
            # optimization — same win as the single-chip step, round 5)
            idx = jnp.where(prep.found, prep.slots, cap)
            bump = jnp.zeros((cap,), jnp.float32).at[idx].max(
                1.0, mode="drop")
            w = w + jax.lax.pmax(bump, axis)
            gidx = jnp.where(prep.found, prep.slots, cap)
            return w, (loss, gidx, g_rows)

        xs = (chunk_arrays, ts_f, ts_c)
        weights, (losses, gidx, g_rows) = jax.lax.scan(
            scan_body, weights, xs)
        # sort-reduced cotangent accumulation (13.7 vs 26.8 ms at the
        # single-chip operating point, probe_grad_scatter round 5); the
        # psum then rides the compacted-identical [cap, F] result
        grads = fusion.scatter_add_rows(
            gidx.reshape(-1), g_rows.reshape(-1, fdim), cap)
        grads = jax.lax.psum(grads, axis)
        updates, opt_state = opt.update(grads, opt_state, features)
        # exact per-iteration lr schedule hook (see optimize.py): Adam's
        # direction is lr-independent, so scaling equals adam(lr * scale)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        features = optax.apply_updates(features, updates)
        return features, weights, opt_state, jnp.mean(losses)

    table_spec = tbl.replicated_spec(example_table)
    opt_spec = jax.tree.map(lambda _: P(), opt.init(jnp.zeros((1, 1))))
    chunk_spec = (P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis), P(None, axis))
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), opt_spec, table_spec, chunk_spec,
                  P(None, axis), P(None, axis), P(), P(), P(), P(), P(),
                  P()),
        out_specs=(P(), P(), opt_spec, P()),
        check_vma=False)

    def step(state, table, depth, T_wc, intr, bound_min, n_xyz, sdf_delta,
             key, lr_scale: jnp.ndarray | float = 1.0):
        # identical RNG structure to the single-device step: pixel choice
        # from k_rays, then per-chunk keys each split into (fine, coarse)
        # jitter draws — drawn here at full chunk width and row-sharded
        k_rays, k_chunks = jax.random.split(key)
        rays = optmod.build_rays_from_frame(
            k_rays, depth, T_wc, intr, ray_max_dist, n_rays,
            neighbor_kernel=neighbor_kernel)
        keys = jax.random.split(k_chunks, n_chunks)
        ts_f, ts_c = jax.vmap(
            lambda k: render.draw_sampling_uniforms(
                k, train_ray_splits, n_fine, n_coarse))(keys)

        def reshape(x):
            return x.reshape((n_chunks, train_ray_splits) + x.shape[1:])

        chunk_arrays = (reshape(rays.uv), reshape(rays.gt_pts),
                        reshape(rays.mask), reshape(rays.neighbor_pts),
                        reshape(rays.neighbor_masks))
        features, weights, opt_state, loss = sharded(
            state.features, state.weights, state.opt_state, table,
            chunk_arrays, ts_f, ts_c, rays.T_wc, rays.intr, bound_min,
            n_xyz, sdf_delta, jnp.asarray(lr_scale, jnp.float32))
        return optmod.OptimState(features=features, weights=weights,
                                 opt_state=opt_state), loss

    return opt, jax.jit(step, donate_argnums=(0,))


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


def make_sharded_pretrain_step(mesh: Mesh, optimizer,
                               reg_weight: float = 1e-3,
                               axis: str = "dp"):
    """Jitted embedding-pretraining step with the PATCH batch sharded.

    The third DP surface of SURVEY §2.5 (after points-sharded fusion and
    rays-sharded optimization): each chip runs the PointNet + decoder
    forward/backward on its batch shard, gradients pmean over ICI, the
    Adam update is replicated.  Matches the single-device
    models/local_point_fusion.FusionPointNetTrainer step exactly (the loss
    is a mean over equal shards, so pmean-of-shard-means == global mean).

    ``optimizer`` is the trainer's optax optimizer (shared so the LR
    schedule stays identical).  Signature: step(params, opt_state,
    input_pts [B,N,6], n_keep [B], training_pts [B,Q,3], gt_sdf [B,Q]) ->
    (params, opt_state, loss, logs); B must divide the mesh size.
    """
    # imported here: models -> parallel would otherwise be cyclic
    from bnv_fusion_tpu.models.local_point_fusion import pretrain_loss

    grad_fn = jax.value_and_grad(
        partial(pretrain_loss, reg_weight=reg_weight), has_aux=True)

    def local_fn(params, opt_state, input_pts, n_keep, training_pts,
                 gt_sdf):
        (loss, logs), g = grad_fn(params, input_pts, n_keep, training_pts,
                                  gt_sdf)
        g = jax.lax.pmean(g, axis)
        loss = jax.lax.pmean(loss, axis)
        logs = jax.tree.map(lambda v: jax.lax.pmean(v, axis), logs)
        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logs

    opt_spec = jax.tree.map(lambda _: P(), optimizer.init(
        jnp.zeros((1, 1))))
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), opt_spec, P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), opt_spec, P(), P()),
        check_vma=False)
    return jax.jit(sharded)
