"""Compare seg_reduce_sorted's segment COUNT against an XLA boundary count
on the same input, on the default backend (hardware).

Context (probe_overflow.py): at the bench operating point the fuse pipeline
reports per-frame n_unique ~104k where the true distinct corner-key count
is ~80k, and flat_u fills its entire width with distinct "real" keys —
symptoms of an inflated kernel count admitting garbage rows via the
arange(u) < n_seg mask.  Tests pin the kernel in interpret mode / on CPU,
so a hardware-only miscount would slip through.  This isolates the count:
stage-1 input (sorted (cell, mcode), two_keys) and stage-2 input (sorted
corner keys), kernel count vs jnp boundary count, per frame.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import fusion, voxel as vx
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.kernels.seg_reduce import seg_reduce_sorted
    from bnv_fusion_tpu.pipeline import _frame_points

    cfg = load_config([
        f"model.voxel_size={voxel}", "dataset.num_images=48",
        "dataset.img_res=[480,640]",
    ])
    ds = get_dataset(cfg, "val")
    k = 16

    vs = float(cfg.model.voxel_size)
    min_c, max_c, n_xyz_t = vx.get_world_range(ds.dimensions, vs)
    n_xyz_np = np.asarray(n_xyz_t)
    n_vox = int(np.prod(n_xyz_np))

    @jax.jit
    def run(depths, T_wcs, intrs, bound_min, bound_max):
        pts_w, normals_w, valid = jax.vmap(_frame_points)(
            depths, T_wcs, intrs)
        cell_s, mcode_s, _, _, _ = jax.vmap(fusion._cellsort_sort1,
                                            in_axes=(0, 0, 0, None, None,
                                                     None, None, None))(
            pts_w, normals_w, valid, bound_min, bound_max, vs,
            jnp.asarray(n_xyz_np), n_vox)

        # XLA truth: distinct valid (cell, mcode) pairs per frame
        def xla_groups(c, m):
            pc = jnp.concatenate([jnp.full((1,), -1, c.dtype), c[:-1]])
            pm = jnp.concatenate([jnp.full((1,), -1, m.dtype), m[:-1]])
            return jnp.sum(((c != pc) | (m != pm)) & (c < n_vox))

        g_xla = jax.vmap(xla_groups)(cell_s, mcode_s).astype(jnp.int32)

        ones = jnp.ones((k, 1, cell_s.shape[1]), jnp.int32)
        zf = jnp.zeros((k, 1, cell_s.shape[1]), jnp.float32)
        # zero payloads on sentinel rows per the kernel contract
        evalid = (cell_s < n_vox)
        ones = ones * evalid[:, None, :].astype(jnp.int32)
        cell_u, mcode_u, _, _, g_kern = seg_reduce_sorted(
            cell_s, ones, zf, u=65536, sent=n_vox, keys2=mcode_s,
            two_keys=True)

        # stage-2 input: corner keys from the emitted groups (fusion.py's
        # exact construction), then kernel count vs XLA boundary count
        u_cell = 65536
        gmask = jnp.arange(u_cell)[None, :] < \
            jnp.minimum(g_kern, u_cell)[:, None]
        s0 = int(n_xyz_np[1] * n_xyz_np[2])
        s1 = int(n_xyz_np[2])
        from bnv_fusion_tpu import voxel as vxm
        pattern = jnp.asarray(vxm._CORNER_PATTERN)
        moff = jnp.stack([(mcode_u >> 2) & 1, (mcode_u >> 1) & 1,
                          mcode_u & 1], axis=-1)
        offs = pattern[None, None, :, :] * moff[:, :, None, :]
        ckey = cell_u[:, :, None] + offs[..., 0] * s0 + offs[..., 1] * s1 + \
            offs[..., 2]
        ckey = jnp.where(gmask[:, :, None], ckey, n_vox)
        ck = ckey.reshape(k, u_cell * 8)
        ck_s = jax.vmap(lambda x: jax.lax.sort((x,), num_keys=1)[0])(ck)

        def xla_unique(c):
            pc = jnp.concatenate([jnp.full((1,), -1, c.dtype), c[:-1]])
            return jnp.sum((c != pc) & (c < n_vox))

        u_xla = jax.vmap(xla_unique)(ck_s).astype(jnp.int32)
        ones2 = (ck_s < n_vox).astype(jnp.int32)[:, None, :]
        zf2 = jnp.zeros((k, 1, ck_s.shape[1]), jnp.float32)
        _, _, _, _, u_kern = seg_reduce_sorted(
            ck_s, ones2, zf2, u=131072, sent=n_vox)

        # K-frame batch union of distinct corner keys (what
        # max_unique_per_batch must cover at this K)
        allk = jax.lax.sort((ck_s.reshape(-1),), num_keys=1)[0]
        union = xla_unique(allk).astype(jnp.int32)
        return g_xla, g_kern, u_xla, u_kern, union

    all_gx, all_gk, all_ux, all_uk, unions = [], [], [], [], []
    n = len(ds)
    for i0 in range(0, n - k + 1, k):
        frames = [ds[i] for i in range(i0, i0 + k)]
        depths = jnp.stack([jnp.asarray(f["depth"], jnp.float32)
                            for f in frames])
        T_wcs = jnp.stack([jnp.asarray(f["T_wc"], jnp.float32)
                           for f in frames])
        intrs = jnp.stack([jnp.asarray(f["intr_mat"], jnp.float32)
                           for f in frames])
        gx, gk, ux, uk, un = run(depths, T_wcs, intrs, jnp.asarray(min_c),
                                 jnp.asarray(max_c))
        all_gx.append(np.asarray(gx)); all_gk.append(np.asarray(gk))
        all_ux.append(np.asarray(ux)); all_uk.append(np.asarray(uk))
        unions.append(int(np.asarray(un)))
    gx = np.concatenate(all_gx); gk = np.concatenate(all_gk)
    ux = np.concatenate(all_ux); uk = np.concatenate(all_uk)
    print(f"stage-1 groups/frame ({n} frames, f32 device semantics): "
          f"max {gx.max()} mean {gx.mean():.0f}  kernel match: "
          f"{bool((gx == gk).all())}")
    print(f"stage-2 unique corner voxels/frame: max {ux.max()} mean "
          f"{ux.mean():.0f}  kernel match: {bool((ux == uk).all())}")
    print(f"  (f64 numpy probe_occupancy says 80117 — the f32 device "
          f"semantics put slab-plane points in an extra corner layer)")
    print(f"  width fits: 2048-aligned 1.05x = "
          f"{2048 * int(np.ceil(ux.max() * 1.05 / 2048))}, 1.15x = "
          f"{2048 * int(np.ceil(ux.max() * 1.15 / 2048))}")
    print(f"K={k} batch-union corner voxels: {unions} "
          f"(max {max(unions)}; width max_unique_per_batch, default 2*u)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
