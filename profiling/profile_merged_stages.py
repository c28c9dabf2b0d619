"""Stage costs of the PRODUCTION fuse path (fuse_frames_merged with the
batched seg-reduce kernel), DCE-proofed.

The older profile_cell_stages.py covers the legacy per-frame XLA path; this
one splits the round-3 merged-kernel path that bench.py actually runs:

  reduce      — _cellsort_reduce_batched (geometry + sort1 + encode-fm +
                both Pallas segment reductions + per-frame compaction)
  +mergesort  — + the K*u cross-frame lax.sort (bf16-packed payloads ride
                the real path's f32 re-expansion here, close enough for
                deltas)
  +segments   — + boundary detection, exact int cumsums, end compaction,
                W/H/S extraction (the K shifted gathers)
  full        — + insert_unique_flat + running-mean update (fuse_frames_
                merged end to end) + the TSDF prior at the bench cadence

Every variant reduces EVERYTHING it computed (features included — the DCE
trap) into one scalar fetched via np.asarray.

Usage: python profiling/profile_merged_stages.py [voxel] [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel_size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    kf = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import fusion, geometry, tables as tbl
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset

    cfg = load_config([
        f"model.voxel_size={voxel_size}",
        f"dataset.num_images={kf}",
        "dataset.img_res=[480,640]",
        "model.max_unique_per_frame=116736",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(len(ds))]

    depths = jnp.asarray(np.stack([np.asarray(f["depth"], np.float32)
                                   for f in frames]))
    T_wcs = jnp.asarray(np.stack([np.asarray(f["T_wc"], np.float32)
                                  for f in frames]))
    intrs = jnp.asarray(np.stack([np.asarray(f["intr_mat"], np.float32)
                                  for f in frames]))
    bound_min = jnp.asarray(ds.dimensions * 0 - ds.dimensions / 2)
    bound_max = jnp.asarray(ds.dimensions / 2)
    mu = int(cfg.model.max_unique_per_frame)
    muc = int(getattr(cfg.model, "max_unique_cells_per_frame", 65536))
    n_xyz = [int(np.ceil(d / voxel_size)) + 1 for d in np.asarray(
        ds.dimensions)]
    table = tbl.create_table(8, int(cfg.model.table_capacity), n_xyz=n_xyz)
    n_vox = table.n_voxels if hasattr(table, "n_voxels") \
        else table.slot_map.shape[0]
    min_pts = int(cfg.model.min_pts_in_grid)

    from bnv_fusion_tpu.pipeline import _frame_points

    def frames_to_points(depths, T_wcs, intrs):
        return jax.vmap(_frame_points)(depths, T_wcs, intrs)

    def reduce_stage(depths, T_wcs, intrs):
        pts, nrm, val = frames_to_points(depths, T_wcs, intrs)
        return fusion._cellsort_reduce_batched(
            params, pts, nrm, val, bound_min, bound_max, voxel_size,
            jnp.float32, mu, muc, jnp.asarray(n_xyz), n_vox, 8,
            sort_bf16=True)

    def v_reduce(depths, T_wcs, intrs):
        out = reduce_stage(depths, T_wcs, intrs)
        return sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) * 1e-6
                   for o in out[:4]) + out[4].sum()

    def presort(depths, T_wcs, intrs):
        (flat_u, cnt_u, sum_u, umask, n_unique, _, cells_dropped,
         n_valid) = reduce_stage(depths, T_wcs, intrs)
        u = flat_u.shape[1]
        mean_u = sum_u / jnp.maximum(cnt_u, 1.0)[..., None]
        nw = jnp.minimum(cnt_u / 32.0, 1.0)
        keep = umask & (cnt_u >= min_pts)
        m3 = kf * u
        key = jnp.where(umask, flat_u, n_vox).reshape(m3)
        nw32 = jnp.where(keep, jnp.minimum(cnt_u, 32.0), 0.0) \
            .astype(jnp.int32).reshape(m3)
        h32 = keep.astype(jnp.int32).reshape(m3)
        s_z = jnp.where(keep[..., None], mean_u * nw[..., None],
                        0.0).reshape(m3, 8)
        return key, nw32, h32, s_z, n_unique

    def v_mergesort(depths, T_wcs, intrs):
        key, nw32, h32, s_z, n_unique = presort(depths, T_wcs, intrs)
        ops = jax.lax.sort((key, nw32, h32)
                           + tuple(s_z[:, j] for j in range(8)), num_keys=1)
        return (sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) * 1e-6
                    for o in ops) + n_unique.sum())

    def v_segments(depths, T_wcs, intrs):
        key, nw32, h32, s_z, n_unique = presort(depths, T_wcs, intrs)
        ops = jax.lax.sort((key, nw32, h32)
                           + tuple(s_z[:, j] for j in range(8)), num_keys=1)
        key_s, nw_s, h_s = ops[0], ops[1], ops[2]
        s_s = jnp.stack(ops[3:], axis=-1)
        m3 = key.shape[0]
        prev = jnp.concatenate([jnp.full((1,), -1, key_s.dtype), key_s[:-1]])
        bnd = key_s != prev
        ev = key_s < n_vox
        wcum = jnp.cumsum(nw_s)
        hcum = jnp.cumsum(h_s)
        nxt = jnp.concatenate([bnd[1:], jnp.ones((1,), bool)])
        is_end = nxt & ev
        n_uniq_b = jnp.sum(is_end).astype(jnp.int32)
        ub = min(2 * mu, m3)
        idx = jax.lax.broadcasted_iota(jnp.int32, (m3, 1), 0)[:, 0]
        end = jax.lax.sort(jnp.where(is_end, idx, m3))[:ub]
        end = jnp.minimum(end, m3 - 1)
        pend = jnp.concatenate([jnp.full((1,), -1, end.dtype), end[:-1]])
        flat_b = key_s[end]
        wlo = jnp.where(pend >= 0, wcum[jnp.maximum(pend, 0)], 0)
        W = (wcum[end] - wlo).astype(jnp.float32) / 32.0
        hlo = jnp.where(pend >= 0, hcum[jnp.maximum(pend, 0)], 0)
        H = (hcum[end] - hlo).astype(jnp.float32)
        seg_len = (end - pend).astype(jnp.int32)
        S = jnp.zeros((ub, 8), jnp.float32)
        for i in range(kf):
            take = jnp.maximum(end - i, 0)
            S = S + jnp.where((i < seg_len)[:, None], s_s[take], 0.0)
        return (jnp.sum(jnp.abs(S)) * 1e-6 + jnp.sum(W) + jnp.sum(H)
                + jnp.sum(flat_b) * 1e-9 + n_uniq_b + n_unique.sum())

    def v_full(table, depths, T_wcs, intrs):
        pts, nrm, val = frames_to_points(depths, T_wcs, intrs)
        table, stats = fusion.fuse_frames_merged(
            table, params, pts, nrm, val, bound_min, bound_max, voxel_size,
            min_pts, max_unique=mu, max_unique_cells=muc,
            seg_kernel=True, sort_bf16=True)
        return (jnp.sum(jnp.abs(table.features)) * 1e-6
                + jnp.sum(table.weights) * 1e-6 + stats.n_valid_pts.sum())

    variants = [
        ("reduce (geom+sort1+enc+kernels)", jax.jit(v_reduce)),
        ("+ cross-frame merge sort", jax.jit(v_mergesort)),
        ("+ segment extraction", jax.jit(v_segments)),
    ]
    results = []
    for name, fn in variants:
        _ = np.asarray(fn(depths, T_wcs, intrs))  # compile
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            c = fn(depths, T_wcs, intrs)
        c = np.asarray(c)
        dt = (time.time() - t0) / reps * 1000
        results.append((name, dt))
        print(f"{name:38s} {dt:8.2f} ms/launch  {dt/kf:6.2f} ms/frame "
              f"(check {c:.4e})", flush=True)

    ffull = jax.jit(v_full)
    _ = np.asarray(ffull(table, depths, T_wcs, intrs))
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        c = ffull(table, depths, T_wcs, intrs)
    c = np.asarray(c)
    dt = (time.time() - t0) / reps * 1000
    results.append(("full (+ insert + update)", dt))
    print(f"{'full (+ insert + update)':38s} {dt:8.2f} ms/launch  "
          f"{dt/kf:6.2f} ms/frame (check {c:.4e})", flush=True)

    print("\nper-frame deltas (ms):")
    prev = 0.0
    for name, dt in results:
        print(f"  {name:38s} {(dt - prev)/kf:6.2f}")
        prev = dt


if __name__ == "__main__":
    sys.exit(main())
