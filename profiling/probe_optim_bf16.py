"""Optimize-iteration cost with bf16 render compute vs f32.

The optimize loop sits at a ~146 ms/iter serial floor on one v5e core and
RESULTS.md attributes the forward to lane-padding bandwidth ([264k, 8]
intermediates pad to 128 lanes).  bf16 activations halve the bytes every
padded op moves; Adam and the gradient accumulation stay f32.

Usage: python profiling/probe_optim_bf16.py [n_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import optimize, tsdf
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        "model.voxel_size=0.01",
        "dataset.num_images=48",
        "dataset.img_res=[480,640]",
        "dataset.stage_raw_depth=true",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(len(ds))]
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(0, len(frames) - 8 + 1, 8):
        nm.integrate_batch(frames[i:i + 8])
    _ = np.asarray(nm.table.weights[:1])

    sdf_delta = tsdf.prepare_sdf_delta(
        nm.tsdf_vol, nm.tsdf_voxel_size, nm.truncated_dist,
        nm.sdf_delta_weight)

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        opt, step, multi = optimize.make_optimize_step(
            nm.params, nm.voxel_size, nm.min_pts_in_grid,
            nm.truncated_units, nm.truncated_dist, nm.ray_max_dist,
            n_rays=nm.sampling_size, train_ray_splits=nm.train_ray_splits,
            lr=1e-3, compute_dtype=dt)
        # fresh buffers per phase: the first launch donates state.features,
        # which otherwise aliases (and deletes) nm.table.features
        table_p = nm.table.replace(features=nm.table.features + 0,
                                   weights=nm.table.weights + 0)
        state = optimize.init_optim_state(opt, table_p)
        k = 4
        key = jax.random.key(0)

        def launch(state, key):
            keys = jax.random.split(key, k + 1)
            fis = np.arange(k) % len(nm.frames)
            import jax.numpy as jnp2
            depths = jnp2.stack([nm.frames[i]["depth"] for i in fis])
            T_wcs = jnp2.stack([nm.frames[i]["T_wc"] for i in fis])
            intrs = jnp2.stack([nm.frames[i]["intr"] for i in fis])
            state, losses = multi(state, table_p, depths, T_wcs, intrs,
                                  nm.bound_min, nm.n_xyz, sdf_delta,
                                  keys[:k])
            return state, keys[k], losses

        t0 = time.time()
        state, key, losses = launch(state, key)
        _ = np.asarray(losses[-1])
        print(f"{name}: first launch (compile) {time.time()-t0:.1f}s "
              f"loss {np.asarray(losses)}", flush=True)
        t0 = time.time()
        done = k
        while done < n_iters:
            state, key, losses = launch(state, key)
            done += k
        last = np.asarray(losses[-1])
        dt_wall = time.time() - t0
        print(f"{name}: {dt_wall/(n_iters-k)*1000:6.1f} ms/iter "
              f"({n_iters-k} iters, final loss {float(last):.4f})",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
