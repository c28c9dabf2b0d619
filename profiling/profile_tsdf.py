"""TSDF integrate variants on the real chip: 2-D vs flattened depth gather.

Usage: python profiling/profile_tsdf.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import tsdf
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset

    cfg = load_config(["dataset.num_images=8", "dataset.img_res=[480,640]"])
    ds = get_dataset(cfg, "val")
    k = 8
    frames = [ds[i] for i in range(k)]
    depths = jnp.stack([jnp.asarray(f["depth"], jnp.float32) for f in frames])
    T_wcs = jnp.stack([jnp.asarray(f["T_wc"], jnp.float32) for f in frames])
    intrs = jnp.stack([jnp.asarray(f["intr_mat"], jnp.float32) for f in frames])
    vs = 0.025
    vol0, _ = tsdf.create_tsdf_volume(ds.dimensions, vs)
    print("grid", vol0.sdf.shape, int(np.prod(vol0.sdf.shape)), "voxels")

    def integrate_flat(vol, depth, intr, T_wc):
        trunc = 5.0 * vs
        dx, dy, dz = vol.sdf.shape
        ii = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 0)
        jj = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 1)
        kk = jax.lax.broadcasted_iota(jnp.float32, (dx, dy, dz), 2)
        world = jnp.stack([ii, jj, kk], axis=-1) * vs + vol.origin
        T_cw = jnp.linalg.inv(T_wc)
        cam = world @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = cam[..., 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
        px = jnp.round(cam[..., 0] * intr[0, 0] / safe_z + intr[0, 2]
                       ).astype(jnp.int32)
        py = jnp.round(cam[..., 1] * intr[1, 1] / safe_z + intr[1, 2]
                       ).astype(jnp.int32)
        h, w = depth.shape
        in_view = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (z > 0)
        flat = jnp.clip(py, 0, h - 1) * w + jnp.clip(px, 0, w - 1)
        depth_val = jnp.where(in_view,
                              depth.reshape(-1)[flat.reshape(-1)]
                              .reshape(flat.shape), 0.0)
        depth_diff = depth_val - z
        valid = (depth_val > 0) & (depth_diff >= -trunc)
        dist = jnp.minimum(1.0, depth_diff / trunc)
        w_old = vol.weight
        w_new = w_old + 1.0
        sdf_new = (w_old * vol.sdf + dist) / w_new
        return vol.replace(sdf=jnp.where(valid, sdf_new, vol.sdf),
                           weight=jnp.where(valid, w_new, vol.weight))

    @jax.jit
    def run_2d(vol, depths, T_wcs, intrs):
        def body(vol, fr):
            d, T, i = fr
            return tsdf.integrate(vol, d, i, T, vs), None
        vol, _ = jax.lax.scan(body, vol, (depths, T_wcs, intrs))
        return jnp.sum(jnp.abs(vol.sdf)) + jnp.sum(vol.weight)

    @jax.jit
    def run_flat(vol, depths, T_wcs, intrs):
        def body(vol, fr):
            d, T, i = fr
            return integrate_flat(vol, d, i, T), None
        vol, _ = jax.lax.scan(body, vol, (depths, T_wcs, intrs))
        return jnp.sum(jnp.abs(vol.sdf)) + jnp.sum(vol.weight)

    for name, fn in [("2d-gather", run_2d), ("flat-gather", run_flat)]:
        r = np.asarray(fn(vol0, depths, T_wcs, intrs))
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = np.asarray(fn(vol0, depths, T_wcs, intrs))
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        print(f"{name:12s} {med*1000:8.2f} ms/launch {med*1000/k:7.2f} "
              f"ms/frame (check {float(r):.6e})")


if __name__ == "__main__":
    sys.exit(main())
