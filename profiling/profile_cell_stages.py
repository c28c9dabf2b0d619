"""Stage costs of fuse_frame_cellsort on the real chip, DCE-proofed.

Each variant computes a strictly larger prefix of the cell-keyed fuse and
reduces EVERYTHING it computed into the scalar output, so XLA cannot
dead-code-eliminate any stage (the failure mode that corrupted earlier
profiles).  Stage costs = launch-time differences at K frames per launch.

Usage: python profiling/profile_cell_stages.py [voxel] [K] [mu_cells]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel_size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mu_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 65536

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import fusion, geometry, tables as tbl, voxel
    from bnv_fusion_tpu import nn as bnn
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu import voxel as vx

    cfg = load_config([
        f"model.voxel_size={voxel_size}",
        "dataset.num_images=16",
        "dataset.img_res=[480,640]",
    ])
    m = cfg.model
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    min_c, max_c, n_xyz = vx.get_world_range(ds.dimensions, voxel_size)
    bound_min, bound_max = jnp.asarray(min_c), jnp.asarray(max_c)
    table0 = tbl.create_table(int(m.feature_vector_size),
                              int(m.table_capacity), n_xyz=n_xyz)
    max_unique = int(m.max_unique_per_frame)
    min_pts = int(m.min_pts_in_grid)
    fdim = int(m.feature_vector_size)
    n_vox = table0.slot_map.shape[0]
    nx = jnp.asarray(np.asarray(n_xyz, np.int32))
    u_cell = mu_cells

    frames = [ds[i] for i in range(k)]
    depths = jnp.stack([jnp.asarray(f["depth"], jnp.float32) for f in frames])
    T_wcs = jnp.stack([jnp.asarray(f["T_wc"], jnp.float32) for f in frames])
    intrs = jnp.stack([jnp.asarray(f["intr_mat"], jnp.float32) for f in frames])

    def geom(depth, T_wc, intr):
        xyz_cam = geometry.depth_to_xyz(depth, intr)
        valid = (depth > 0).reshape(-1)
        normals_cam = geometry.normals_from_depth(depth, intr, mask=depth > 0)
        pts_w = geometry.transform_points(T_wc, xyz_cam.reshape(-1, 3))
        normals_w = -geometry.rotate_vectors(T_wc, normals_cam.reshape(-1, 3))
        return pts_w, normals_w, valid

    # replicate fuse_frame_cellsort stage by stage (kept in sync by the
    # full-path parity check at the end)
    def keys_stage(depth, T_wc, intr):
        pts_w, normals, valid = geom(depth, T_wc, intr)
        inside = jnp.all((pts_w > bound_min + voxel_size) &
                         (pts_w < bound_max - voxel_size), axis=-1) & valid
        coords = voxel.position_to_coords(pts_w, bound_min, voxel_size)
        fl = jnp.floor(coords)
        mi = (jnp.ceil(coords) > fl).astype(jnp.int32)
        fi = fl.astype(jnp.int32)
        inside = inside & jnp.all(fi >= 0, axis=-1) & \
            jnp.all(fi + mi < nx, axis=-1)
        s0 = nx[1] * nx[2]
        s1 = nx[2]
        cell = fi[:, 0] * s0 + fi[:, 1] * s1 + fi[:, 2]
        mcode = mi[:, 0] * 4 + mi[:, 1] * 2 + mi[:, 2]
        cell = jnp.where(inside, cell, n_vox)
        mcode = jnp.where(inside, mcode, 8)
        coords_z = jnp.where(inside[:, None], coords, 0.0)
        normals_z = jnp.where(inside[:, None], normals, 0.0)
        return cell, mcode, coords_z, normals_z

    def sort1_stage(depth, T_wc, intr):
        cell, mcode, coords_z, normals_z = keys_stage(depth, T_wc, intr)
        ops = jax.lax.sort(
            (cell, mcode, coords_z[:, 0], coords_z[:, 1], coords_z[:, 2],
             normals_z[:, 0], normals_z[:, 1], normals_z[:, 2]), num_keys=2)
        return ops

    def encode_stage(depth, T_wc, intr):
        ops = sort1_stage(depth, T_wc, intr)
        cell_s, mcode_s = ops[0], ops[1]
        coords_s = jnp.stack(ops[2:5], axis=-1)
        normals_s = jnp.stack(ops[5:8], axis=-1)
        entry_valid = cell_s < n_vox
        corners_s = voxel.corner_neighbors(coords_s)
        rel = voxel.local_offsets(coords_s, corners_s)
        pn_in = jnp.concatenate(
            [rel, jnp.broadcast_to(normals_s[:, None, :], rel.shape)],
            axis=-1)
        feats = bnn.encoder_apply(params, pn_in, jnp.float32)
        n = cell_s.shape[0]
        f8 = jnp.where(entry_valid[:, None, None], feats, 0.0) \
            .astype(jnp.float32).reshape(n, 8 * fdim)
        return cell_s, mcode_s, f8

    def seg1_stage(depth, T_wc, intr):
        cell_s, mcode_s, f8 = encode_stage(depth, T_wc, intr)
        n = cell_s.shape[0]
        entry_valid = cell_s < n_vox
        prev_c = jnp.concatenate([jnp.full((1,), -1, cell_s.dtype),
                                  cell_s[:-1]])
        prev_m = jnp.concatenate([jnp.full((1,), -1, mcode_s.dtype),
                                  mcode_s[:-1]])
        boundary = (cell_s != prev_c) | (mcode_s != prev_m)
        ch_mean = jnp.mean(f8, axis=0, keepdims=True)
        cum = jnp.cumsum(f8 - ch_mean, axis=0)
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
        gcnt = end_pos - prev_end
        cum_lo = jnp.where((prev_end >= 0)[:, None],
                           cum[jnp.maximum(prev_end, 0)], 0.0)
        gsum = cum[end_pos] - cum_lo + \
            ch_mean * gcnt.astype(jnp.float32)[:, None]
        return cell_u, mcode_u, gcnt, gsum, gmask, n_groups

    def sort2_stage(depth, T_wc, intr):
        cell_u, mcode_u, gcnt, gsum, gmask, n_groups = seg1_stage(
            depth, T_wc, intr)
        s0 = nx[1] * nx[2]
        s1 = nx[2]
        pattern = jnp.asarray(voxel._CORNER_PATTERN)
        moff = jnp.stack([(mcode_u >> 2) & 1, (mcode_u >> 1) & 1,
                          mcode_u & 1], axis=-1)
        offs = pattern[None, :, :] * moff[:, None, :]
        ckey = cell_u[:, None] + offs[..., 0] * s0 + offs[..., 1] * s1 + \
            offs[..., 2]
        ckey = jnp.where(gmask[:, None], ckey, n_vox)
        m2 = u_cell * 8
        ck = ckey.reshape(m2)
        f2 = jnp.where(gmask[:, None, None],
                       gsum.reshape(u_cell, 8, fdim), 0.0).reshape(m2, fdim)
        c2 = jnp.where(gmask[:, None],
                       jnp.broadcast_to(gcnt[:, None], (u_cell, 8)),
                       0).reshape(m2)
        ops2 = jax.lax.sort(
            (ck,) + tuple(f2[:, j] for j in range(fdim)) + (c2,), num_keys=1)
        return ops2

    def seg2_stage(depth, T_wc, intr):
        ops2 = sort2_stage(depth, T_wc, intr)
        m2 = u_cell * 8
        ck_s = ops2[0]
        f2_s = jnp.stack(ops2[1:1 + fdim], axis=-1)
        c2_s = ops2[-1]
        prev2 = jnp.concatenate([jnp.full((1,), -1, ck_s.dtype), ck_s[:-1]])
        b2 = ck_s != prev2
        ev2 = ck_s < n_vox
        mean2 = jnp.mean(f2_s, axis=0, keepdims=True)
        cum2 = jnp.cumsum(f2_s - mean2, axis=0)
        ccum2 = jnp.cumsum(c2_s)
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
        cnt_u = (ccum2[end2] - clo).astype(jnp.float32)
        flo = jnp.where((pend2 >= 0)[:, None],
                        cum2[jnp.maximum(pend2, 0)], 0.0)
        sum_u = cum2[end2] - flo + mean2 * seg_n[:, None]
        return flat_u, cnt_u, sum_u, umask, n_unique

    def make_scan(stage_fn):
        @jax.jit
        def run(depths, T_wcs, intrs):
            def body(c, fr):
                out = stage_fn(*fr)
                leaves = jax.tree.leaves(out)
                return c + sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                               for x in leaves), None
            s, _ = jax.lax.scan(body, jnp.zeros(()), (depths, T_wcs, intrs))
            return s
        return run

    @jax.jit
    def full(table, depths, T_wcs, intrs):
        def body(table, fr):
            depth, T_wc, intr = fr
            pts_w, normals, valid = geom(depth, T_wc, intr)
            table, stats = fusion.fuse_frame_cellsort(
                table, params, pts_w, normals, valid, bound_min, bound_max,
                voxel_size, min_pts, max_unique=max_unique,
                max_unique_cells=u_cell)
            return table, stats.n_touched
        table, nt = jax.lax.scan(body, table, (depths, T_wcs, intrs))
        return (jnp.sum(nt) + table.weights[0] +
                jnp.sum(jnp.abs(table.features)) * 1e-6)

    @jax.jit
    def empty(depths):
        return depths[0, 0, 0]

    def timeit(name, fn, *args, reps=3):
        r = np.asarray(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = np.asarray(fn(*args))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:22s} {med*1000:9.2f} ms/launch "
              f"{med*1000/k:8.2f} ms/frame  (check {float(r):.4e})")
        return med

    print(f"voxel={voxel_size} K={k} mu_cells={u_cell} "
          f"max_unique={max_unique}")
    t_e = timeit("empty", empty, depths)
    t_g = timeit("geometry", make_scan(geom), depths, T_wcs, intrs)
    t_k = timeit("+ keys", make_scan(keys_stage), depths, T_wcs, intrs)
    t_s1 = timeit("+ sort1", make_scan(sort1_stage), depths, T_wcs, intrs)
    t_en = timeit("+ encode", make_scan(encode_stage), depths, T_wcs, intrs)
    t_g1 = timeit("+ seg1+compact", make_scan(seg1_stage),
                  depths, T_wcs, intrs)
    t_s2 = timeit("+ sort2", make_scan(sort2_stage), depths, T_wcs, intrs)
    t_g2 = timeit("+ seg2+compact", make_scan(seg2_stage),
                  depths, T_wcs, intrs)
    t_f = timeit("full cell fuse", full, table0, depths, T_wcs, intrs)

    def d(a, b):
        return (a - b) * 1000 / k

    print("\nper-frame deltas (ms):")
    print(f"  geometry         {d(t_g, t_e):7.2f}")
    print(f"  keys             {d(t_k, t_g):7.2f}")
    print(f"  sort1            {d(t_s1, t_k):7.2f}")
    print(f"  encode           {d(t_en, t_s1):7.2f}")
    print(f"  seg1+compact     {d(t_g1, t_en):7.2f}")
    print(f"  sort2            {d(t_s2, t_g1):7.2f}")
    print(f"  seg2+compact     {d(t_g2, t_s2):7.2f}")
    print(f"  insert+update    {d(t_f, t_g2):7.2f}")
    print(f"  TOTAL fuse       {d(t_f, t_e):7.2f}")


if __name__ == "__main__":
    sys.exit(main())
