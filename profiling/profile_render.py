"""DCE-proofed stage costs of the render-loss chunk (the optimize forward).

Usage: python profiling/profile_render.py
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

    from bnv_fusion_tpu import fusion, geometry, optimize, render, tsdf, voxel
    from bnv_fusion_tpu import nn as bnn
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config(["model.voxel_size=0.01", "dataset.num_images=8",
                       "dataset.img_res=[480,640]"])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    nm = NeuralMap(ds.dimensions, cfg, params)
    nm.integrate_batch([ds[i] for i in range(8)])
    _ = np.asarray(nm.table.weights[:1])
    sdf_delta = tsdf.prepare_sdf_delta(nm.tsdf_vol, nm.tsdf_voxel_size,
                                       nm.truncated_dist, nm.sdf_delta_weight)
    table = nm.table
    f0 = ds[0]
    depth = jnp.asarray(f0["depth"], jnp.float32)
    T_wc = jnp.asarray(f0["T_wc"], jnp.float32)
    intr = jnp.asarray(f0["intr_mat"], jnp.float32)
    n_rays = 1000
    R = 10  # chunks per launch for timing

    def rays_stage(key):
        return optimize.build_rays_from_frame(
            key, depth, T_wc, intr, nm.ray_max_dist, n_rays)

    def sample_stage(key):
        rays = rays_stage(key)
        ray_dirs, cam_loc = geometry.get_camera_rays(rays.uv, rays.T_wc,
                                                     rays.intr)
        gt_depths = jnp.linalg.norm(rays.gt_pts - cam_loc[None, :], axis=-1)
        pts, dists = render.hierarchical_sampling(
            key, nm.truncated_units * 2, int(nm.ray_max_dist * 5), gt_depths,
            rays.gt_pts, ray_dirs, cam_loc,
            offset_distance=nm.truncated_dist)
        return rays, pts, dists, cam_loc

    def gather_stage(key):
        rays, pts, dists, cam_loc = sample_stage(key)
        n, s = pts.shape[:2]
        flat_pts = pts.reshape(n * s, 3)
        coords = voxel.position_to_coords(flat_pts, nm.bound_min,
                                          nm.voxel_size)
        corners = voxel.corner_neighbors(coords)
        tw = voxel.trilinear_weights(coords, corners)
        m = coords.shape[0]
        from bnv_fusion_tpu import tables as tbl
        slots, found = tbl.lookup(table, corners.reshape(m * 8, 3))
        feats = jnp.where(found[:, None], table.features[slots], 0.0)
        w = jnp.where(found, table.weights[slots], 0.0)
        return rays, pts, cam_loc, corners, tw, feats, w, coords

    def decode_stage(key):
        rays, pts, cam_loc, corners, tw, feats, w, coords = gather_stage(key)
        m = coords.shape[0]
        local = voxel.local_offsets(coords, corners)
        alpha = bnn.decoder_apply(params, local,
                                  feats.reshape(m, 8, -1))[..., 0]
        sdf = jnp.sum(alpha * nm.voxel_size * tw, axis=-1)
        return rays, pts, cam_loc, corners, sdf, w

    def delta_stage(key):
        rays, pts, cam_loc, corners, sdf, w = decode_stage(key)
        d = fusion._sample_delta_nearest(sdf_delta, corners, nm.n_xyz)
        return rays, pts, cam_loc, sdf, d, w

    def full_loss(key):
        rays = rays_stage(key)
        loss, corners = render.calculate_loss(
            table.features, table, params, rays, key, nm.bound_min,
            nm.voxel_size, nm.min_pts_in_grid, nm.truncated_units,
            nm.truncated_dist, nm.ray_max_dist, sdf_delta, nm.n_xyz)
        return loss, corners

    def bump_stage(key):
        loss, corners = full_loss(key)
        t2 = fusion.bump_optim_weights(table, corners)
        return loss, t2.weights[0]

    def make(fn):
        @jax.jit
        def run(key):
            def body(c, k):
                out = fn(k)
                leaves = jax.tree.leaves(out)
                return c + sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                               for x in leaves), None
            s, _ = jax.lax.scan(body, jnp.zeros(()),
                                jax.random.split(key, R))
            return s
        return run

    key = jax.random.key(1)
    stages = [
        ("build_rays", rays_stage), ("+sampling", sample_stage),
        ("+gathers", gather_stage), ("+decoderMLP", decode_stage),
        ("+sdf_delta", delta_stage), ("full loss", full_loss),
        ("+bump", bump_stage),
    ]
    prev = None
    for name, fn in stages:
        run = make(fn)
        r = np.asarray(run(key))
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = np.asarray(run(key))
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        d = "" if prev is None else f"  (delta {(med-prev)*1000/R:+6.2f})"
        print(f"{name:12s} {med*1000/R:7.2f} ms/chunk{d}")
        prev = med


if __name__ == "__main__":
    sys.exit(main())
