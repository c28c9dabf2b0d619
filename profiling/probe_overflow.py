"""Diagnose the bench overflow counter: which component overflows?

fuse_frames_merged's table.overflow accumulates THREE components
(fusion.py:776-779): the batch-merge drop (n_uniq_b - ub), the stage-1
group drop (n_groups - u_cell, per frame), and the per-frame stage-2 drop
(n_unique - u, per frame).  bench @ u=90112 reported 725563 overflowed
voxels over 3 K=16 batches while the numpy occupancy probe says the true
K=16 batch union is only 183336 — ~80x apart.  This runs ONE K=16 batch
at the bench operating point on the default backend and prints each
component, plus the kernel's raw n_groups/n_unique vs the numpy truth.

Usage: python profiling/probe_overflow.py [max_unique] [max_unique_batch]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mu = int(sys.argv[1]) if len(sys.argv) > 1 else 90112
    mub = int(sys.argv[2]) if len(sys.argv) > 2 else 0   # 0 = default 2*mu

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import fusion, voxel as vx
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import _frame_points

    cfg = load_config([
        "model.voxel_size=0.01", "dataset.num_images=48",
        "dataset.img_res=[480,640]",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    k = 16
    frames = [ds[i] for i in range(k)]
    depths = jnp.stack([jnp.asarray(f["depth"], jnp.float32) for f in frames])
    T_wcs = jnp.stack([jnp.asarray(f["T_wc"], jnp.float32) for f in frames])
    intrs = jnp.stack([jnp.asarray(f["intr_mat"], jnp.float32)
                       for f in frames])

    vs = float(cfg.model.voxel_size)
    min_c, max_c, n_xyz_t = vx.get_world_range(ds.dimensions, vs)
    n_xyz_np = np.asarray(n_xyz_t)
    n_vox = int(np.prod(n_xyz_np))
    u_cell = 65536
    fdim = 8
    seg_kernel = jax.devices()[0].platform != "cpu"

    @jax.jit
    def run(depths, T_wcs, intrs, bound_min, bound_max):
        pts_w, normals_w, valid = jax.vmap(_frame_points)(
            depths, T_wcs, intrs)
        (flat_u, cnt_u, sum_u, umask, n_unique, u, cells_dropped,
         n_valid) = fusion._cellsort_reduce_batched(
            params, pts_w, normals_w, valid, bound_min, bound_max, vs,
            jnp.float32, mu, u_cell, jnp.asarray(n_xyz_np), n_vox, fdim,
            interpret=not seg_kernel)
        # replicate the merge counting (fusion.py:711-740)
        m3 = k * u
        key = jnp.where(umask, flat_u, n_vox).reshape(m3)
        key_s = jax.lax.sort((key,), num_keys=1)[0]
        prev = jnp.concatenate([jnp.full((1,), -1, key_s.dtype), key_s[:-1]])
        bnd = key_s != prev
        ev = key_s < n_vox
        nxt = jnp.concatenate([bnd[1:], jnp.ones((1,), bool)])
        n_uniq_b = jnp.sum(nxt & ev).astype(jnp.int32)
        # distinct real keys ignoring umask (is flat_u garbage non-sentinel?)
        raw = jnp.sort(flat_u.reshape(m3))
        rprev = jnp.concatenate([jnp.full((1,), -1, raw.dtype), raw[:-1]])
        n_raw = jnp.sum((raw != rprev) & (raw < n_vox)).astype(jnp.int32)
        # per-frame distinct keys within the kernel's emitted rows: equals
        # n_unique if the kernel emits each segment once (then the numpy
        # occupancy probe is undercounting); less if it emits duplicates
        keyf = jnp.where(umask, flat_u, n_vox)          # [K, u]
        keyf_s = jax.vmap(lambda x: jax.lax.sort((x,), num_keys=1)[0])(keyf)
        pf = jnp.concatenate(
            [jnp.full((k, 1), -1, keyf_s.dtype), keyf_s[:, :-1]], axis=1)
        n_distinct = jnp.sum((keyf_s != pf) & (keyf_s < n_vox),
                             axis=1).astype(jnp.int32)
        return n_unique, cells_dropped, n_uniq_b, n_raw, u, n_distinct

    out = run(depths, T_wcs, intrs, jnp.asarray(min_c), jnp.asarray(max_c))
    (n_unique, cells_dropped, n_uniq_b, n_raw, u,
     n_distinct) = [np.asarray(x) for x in out]
    ub = mub if mub else 2 * mu
    print(f"u(stage-2 width)={u}  ub(batch width)={ub}")
    print(f"per-frame n_unique: max {n_unique.max()} mean "
          f"{n_unique.mean():.0f} (numpy truth: max 80117)")
    print(f"per-frame stage-2 drop sum: "
          f"{np.maximum(n_unique - u, 0).sum()}")
    print(f"per-frame cells_dropped sum: {cells_dropped.sum()}")
    print(f"batch n_uniq_b={n_uniq_b} (numpy truth 183336)  "
          f"merge drop={max(int(n_uniq_b) - ub, 0)}")
    print(f"distinct real keys in flat_u ignoring umask: {n_raw}")
    print(f"per-frame distinct emitted keys: max {n_distinct.max()} mean "
          f"{n_distinct.mean():.0f} (== n_unique means no duplicate "
          f"emissions; < n_unique means the kernel double-emits)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
