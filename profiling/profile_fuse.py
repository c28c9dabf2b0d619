"""Stage-ablation profile of the local-fusion hot path on the real chip.

Times progressively larger prefixes of the per-frame fuse program (geometry,
encode, sort, segment-reduce, compaction, table update, TSDF prior), each as
a K-frame lax.scan launch, so stage costs fall out of launch-time differences
while the tunneled runtime's per-dispatch overhead (measured separately with
an empty program) cancels.

Usage:  python profiling/profile_fuse.py [voxel_size] [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel_size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import fusion, geometry, tables as tbl, tsdf, voxel
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
    bound_min = jnp.asarray(min_c)
    bound_max = jnp.asarray(max_c)
    table = tbl.create_table(int(m.feature_vector_size),
                             int(m.table_capacity), n_xyz=n_xyz)
    tsdf_vs = float(m.tsdf_voxel_size)
    tsdf_vol, _ = tsdf.create_tsdf_volume(ds.dimensions, tsdf_vs)
    max_unique = int(m.max_unique_per_frame)
    min_pts = int(m.min_pts_in_grid)
    fdim = int(m.feature_vector_size)

    frames = [ds[i] for i in range(k)]
    depths = jnp.stack([jnp.asarray(f["depth"], jnp.float32) for f in frames])
    T_wcs = jnp.stack([jnp.asarray(f["T_wc"], jnp.float32) for f in frames])
    intrs = jnp.stack([jnp.asarray(f["intr_mat"], jnp.float32) for f in frames])

    n_vox = (table.n_voxels if hasattr(table, "n_voxels")
             else table.slot_map.shape[0])
    nx = jnp.asarray(np.asarray(n_xyz, np.int32))

    def geom(depth, T_wc, intr):
        xyz_cam = geometry.depth_to_xyz(depth, intr)
        valid = (depth > 0).reshape(-1)
        normals_cam = geometry.normals_from_depth(depth, intr, mask=depth > 0)
        pts_w = geometry.transform_points(T_wc, xyz_cam.reshape(-1, 3))
        normals_w = -geometry.rotate_vectors(T_wc, normals_cam.reshape(-1, 3))
        return pts_w, normals_w, valid

    def enc(depth, T_wc, intr):
        pts_w, normals_w, valid = geom(depth, T_wc, intr)
        corners, feats, valid8 = fusion.encode_corner_features(
            params, pts_w, normals_w, valid, bound_min, bound_max, voxel_size)
        return corners, feats, valid8

    def sort_stage(depth, T_wc, intr):
        corners, feats, valid8 = enc(depth, T_wc, intr)
        mtot = corners.shape[0] * 8
        keys = corners.reshape(mtot, 3)
        ok_in = valid8.reshape(mtot)
        inside = jnp.all((keys >= 0) & (keys < nx), axis=-1) & ok_in
        flat = (keys[:, 0] * (nx[1] * nx[2]) + keys[:, 1] * nx[2] + keys[:, 2])
        flat = jnp.where(inside, flat, n_vox)
        f8 = jnp.where(inside[:, None], feats.reshape(mtot, fdim), 0.0)
        sorted_ops = jax.lax.sort(
            (flat,) + tuple(f8[:, j] for j in range(fdim)), num_keys=1)
        return sorted_ops

    def seg_stage(depth, T_wc, intr):
        sorted_ops = sort_stage(depth, T_wc, intr)
        flat_s = sorted_ops[0]
        feats_s = jnp.stack(sorted_ops[1:], axis=-1)
        prev = jnp.concatenate([jnp.full((1,), -1, flat_s.dtype), flat_s[:-1]])
        boundary = flat_s != prev
        entry_valid = flat_s < n_vox
        ch_mean = jnp.mean(feats_s, axis=0, keepdims=True)
        cum = jnp.cumsum(feats_s - ch_mean, axis=0)
        nxt = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
        is_end = nxt & entry_valid
        return flat_s, cum, ch_mean, is_end

    def compact_stage(depth, T_wc, intr):
        flat_s, cum, ch_mean, is_end = seg_stage(depth, T_wc, intr)
        mtot = flat_s.shape[0]
        n_unique = jnp.sum(is_end).astype(jnp.int32)
        u = min(max_unique, mtot)
        idx_m = jax.lax.broadcasted_iota(jnp.int32, (mtot, 1), 0)[:, 0]
        end_pos = jax.lax.sort(jnp.where(is_end, idx_m, mtot))[:u]
        end_pos = jnp.minimum(end_pos, mtot - 1)
        umask = jnp.arange(u) < jnp.minimum(n_unique, u)
        prev_end = jnp.concatenate(
            [jnp.full((1,), -1, end_pos.dtype), end_pos[:-1]])
        flat_u = flat_s[end_pos]
        cnt_u = (end_pos - prev_end).astype(jnp.float32)
        cum_lo = jnp.where((prev_end >= 0)[:, None],
                           cum[jnp.maximum(prev_end, 0)], 0.0)
        sum_u = cum[end_pos] - cum_lo + ch_mean * cnt_u[:, None]
        return flat_u, cnt_u, sum_u, umask

    # --- scan builders ------------------------------------------------------

    def scalar_of(tree):
        leaves = jax.tree.leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.bool_
                           else x.astype(jnp.float32)) for x in leaves)

    def make_scan(stage_fn):
        @jax.jit
        def run(depths, T_wcs, intrs):
            def body(c, fr):
                out = stage_fn(*fr)
                return c + scalar_of(out), None
            s, _ = jax.lax.scan(body, jnp.zeros(()), (depths, T_wcs, intrs))
            return s
        return run

    def make_scan_table(with_tsdf):
        @jax.jit
        def run(table, tsdf_vol, depths, T_wcs, intrs):
            def body(carry, fr):
                table, tsdf_vol = carry
                depth, T_wc, intr = fr
                pts_w, normals_w, valid = geom(depth, T_wc, intr)
                table, stats = fusion.fuse_frame(
                    table, params, pts_w, normals_w, valid, bound_min,
                    bound_max, voxel_size, min_pts, max_unique=max_unique)
                if with_tsdf:
                    tsdf_vol = tsdf.integrate(tsdf_vol, depth, intr, T_wc,
                                              tsdf_vs)
                return (table, tsdf_vol), stats.n_touched
            (table, tsdf_vol), nt = jax.lax.scan(
                body, (table, tsdf_vol), (depths, T_wcs, intrs))
            return jnp.sum(nt) + table.weights[0] + tsdf_vol.sdf[0, 0, 0]
        return run

    @jax.jit
    def tsdf_only(tsdf_vol, depths, T_wcs, intrs):
        def body(vol, fr):
            depth, T_wc, intr = fr
            vol = tsdf.integrate(vol, depth, intr, T_wc, tsdf_vs)
            return vol, None
        vol, _ = jax.lax.scan(body, tsdf_vol, (depths, T_wcs, intrs))
        return vol.sdf[0, 0, 0] + vol.weight[0, 0, 0]

    @jax.jit
    def empty(depths):
        return jnp.float32(0.0) + depths[0, 0, 0]

    def timeit(name, fn, *args, reps=3):
        r = np.asarray(fn(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = np.asarray(fn(*args))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:28s} {med * 1000:9.2f} ms/launch "
              f"{med * 1000 / k:8.2f} ms/frame   (result {float(r):.3e})")
        return med

    print(f"voxel={voxel_size} K={k} max_unique={max_unique} "
          f"n_vox={int(n_vox)} platform={jax.devices()[0].platform}")
    t_empty = timeit("empty launch", empty, depths)
    t_geom = timeit("geometry", make_scan(geom), depths, T_wcs, intrs)
    t_enc = timeit("+ encode", make_scan(enc), depths, T_wcs, intrs)
    t_sort = timeit("+ sort(9op)", make_scan(sort_stage), depths, T_wcs, intrs)
    t_seg = timeit("+ segment-reduce", make_scan(seg_stage),
                   depths, T_wcs, intrs)
    t_cmp = timeit("+ compaction", make_scan(compact_stage),
                   depths, T_wcs, intrs)
    t_fuse = timeit("full fuse (no tsdf)", make_scan_table(False),
                    table, tsdf_vol, depths, T_wcs, intrs)
    t_full = timeit("full fuse + tsdf", make_scan_table(True),
                    table, tsdf_vol, depths, T_wcs, intrs)
    t_tsdf = timeit("tsdf only", tsdf_only, tsdf_vol, depths, T_wcs, intrs)

    def df(a, b):
        return (a - b) * 1000 / k

    print("\nper-frame stage deltas (ms):")
    print(f"  dispatch overhead            {t_empty * 1000:8.2f} (per launch)")
    print(f"  geometry                     {df(t_geom, t_empty):8.2f}")
    print(f"  encode                       {df(t_enc, t_geom):8.2f}")
    print(f"  sort                         {df(t_sort, t_enc):8.2f}")
    print(f"  segment-reduce               {df(t_seg, t_sort):8.2f}")
    print(f"  compaction                   {df(t_cmp, t_seg):8.2f}")
    print(f"  insert+update (fuse-compact) {df(t_fuse, t_cmp):8.2f}")
    print(f"  tsdf integrate               {df(t_full, t_fuse):8.2f}")
    print(f"  tsdf alone                   {df(t_tsdf, t_empty):8.2f}")
    print(f"  full fuse+tsdf per frame     {df(t_full, t_empty):8.2f}")


if __name__ == "__main__":
    sys.exit(main())
