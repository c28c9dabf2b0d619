"""Optimize-loop cost on the real chip: full Adam iteration vs forward-only.

Usage: python profiling/profile_optimize.py [voxel] [iters_per_launch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel_size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import optimize, render, tsdf
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        f"model.voxel_size={voxel_size}",
        "dataset.num_images=8",
        "dataset.img_res=[480,640]",
        f"model.optim_iters_per_launch={group}",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    nm = NeuralMap(ds.dimensions, cfg, params)
    frames = [ds[i] for i in range(len(ds))]
    nm.integrate_batch(frames)
    _ = np.asarray(nm.table.weights[:1])

    # one optimize launch of `group` iterations
    t0 = time.time()
    nm.optimize(n_iters=group)
    _ = np.asarray(nm.table.weights[:1])
    print(f"first optimize launch (compile): {time.time()-t0:.1f} s")

    ts = []
    for _ in range(4):
        t0 = time.time()
        nm.optimize(n_iters=group)
        _ = np.asarray(nm.table.weights[:1])
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"optimize: {med*1000:.1f} ms/launch, {med*1000/group:.1f} ms/iter "
          f"({group} iters/launch)")

    # forward-only loss at the same shapes (no grad, no Adam)
    sdf_delta = tsdf.prepare_sdf_delta(
        nm.tsdf_vol, nm.tsdf_voxel_size, nm.truncated_dist,
        nm.sdf_delta_weight)
    n_rays = nm.sampling_size
    splits = nm.train_ray_splits
    n_chunks = n_rays // splits

    @jax.jit
    def fwd(table, depth, T_wc, intr, key):
        k_rays, k_chunks = jax.random.split(key)
        rays = optimize.build_rays_from_frame(
            k_rays, depth, T_wc, intr, nm.ray_max_dist, n_rays)

        def reshape(x):
            return x.reshape((n_chunks, splits) + x.shape[1:])
        keys = jax.random.split(k_chunks, n_chunks)

        def body(c, inp):
            (uv, gt, mk, npts, nmk), k = inp
            chunk = render.Rays(uv=uv, gt_pts=gt, mask=mk, neighbor_pts=npts,
                                neighbor_masks=nmk, T_wc=rays.T_wc,
                                intr=rays.intr)
            loss, aux = render.calculate_loss(
                table.features, table, params, chunk, k, nm.bound_min,
                nm.voxel_size, nm.min_pts_in_grid, nm.truncated_units,
                nm.truncated_dist, nm.ray_max_dist, sdf_delta, nm.n_xyz,
                jnp.float32)
            return c + loss, None

        s, _ = jax.lax.scan(
            body, jnp.zeros(()),
            ((reshape(rays.uv), reshape(rays.gt_pts), reshape(rays.mask),
              reshape(rays.neighbor_pts), reshape(rays.neighbor_masks)),
             keys))
        return s

    d0 = frames[0]
    depth = jnp.asarray(d0["depth"], jnp.float32)
    T_wc = jnp.asarray(d0["T_wc"], jnp.float32)
    intr = jnp.asarray(d0["intr_mat"], jnp.float32)
    key = jax.random.key(0)
    r = np.asarray(fwd(nm.table, depth, T_wc, intr, key))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = np.asarray(fwd(nm.table, depth, T_wc, intr, key))
        ts.append(time.time() - t0)
    med = sorted(ts)[1]
    print(f"forward-only loss ({n_chunks} chunks): {med*1000:.1f} ms "
          f"(check {float(r):.4e})")


if __name__ == "__main__":
    sys.exit(main())
