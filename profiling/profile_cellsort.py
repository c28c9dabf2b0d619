"""Head-to-head: corner-keyed vs cell-keyed sort-reduce fuse on the real chip.

Usage: python profiling/profile_cellsort.py [voxel] [K] [max_unique_cells]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel_size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mu_cells = int(sys.argv[3]) if len(sys.argv) > 3 else None

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
    max_unique = int(m.max_unique_per_frame)
    min_pts = int(m.min_pts_in_grid)

    frames = [ds[i] for i in range(k)]
    depths = jnp.stack([jnp.asarray(f["depth"], jnp.float32) for f in frames])
    T_wcs = jnp.stack([jnp.asarray(f["T_wc"], jnp.float32) for f in frames])
    intrs = jnp.stack([jnp.asarray(f["intr_mat"], jnp.float32) for f in frames])

    def make(algorithm):
        @jax.jit
        def run(table, depths, T_wcs, intrs):
            def body(table, fr):
                depth, T_wc, intr = fr
                xyz_cam = geometry.depth_to_xyz(depth, intr)
                valid = (depth > 0).reshape(-1)
                normals_cam = geometry.normals_from_depth(depth, intr,
                                                          mask=depth > 0)
                pts_w = geometry.transform_points(T_wc,
                                                  xyz_cam.reshape(-1, 3))
                normals_w = -geometry.rotate_vectors(
                    T_wc, normals_cam.reshape(-1, 3))
                table, stats = fusion.fuse_frame(
                    table, params, pts_w, normals_w, valid, bound_min,
                    bound_max, voxel_size, min_pts, max_unique=max_unique,
                    algorithm=algorithm, max_unique_cells=mu_cells)
                return table, stats.n_touched
            table, nt = jax.lax.scan(body, table, (depths, T_wcs, intrs))
            # scalar-only output, but the checksum MUST consume the features
            # array: without it XLA dead-code-eliminates the whole feature
            # pipeline (encode MLP, feature sort payloads, cumsums) and the
            # measurement lies ~2x (learned the hard way)
            return (jnp.sum(nt) + table.weights[0] +
                    jnp.sum(jnp.abs(table.features)) * 1e-6,
                    table.overflow, table.n_alloc)
        return run

    results = {}
    for algorithm in ("corner", "cell"):
        fn = make(algorithm)
        table = tbl.create_table(int(m.feature_vector_size),
                                 int(m.table_capacity), n_xyz=n_xyz)
        s, ovf_d, na_d = fn(table, depths, T_wcs, intrs)
        _ = np.asarray(s)
        ts = []
        for _ in range(4):
            t0 = time.time()
            s, ovf_d, na_d = fn(table, depths, T_wcs, intrs)
            _ = np.asarray(s)
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        ovf = int(np.asarray(ovf_d))
        na = int(np.asarray(na_d))
        results[algorithm] = (med, na)
        print(f"{algorithm:8s} {med*1000:8.2f} ms/launch "
              f"{med*1000/k:7.2f} ms/frame  alloc={na} overflow={ovf} "
              f"(check {float(np.asarray(s)):.6e})")

    a, b = results["corner"][0], results["cell"][0]
    print(f"speedup corner->cell: {a/b:.2f}x; alloc parity: "
          f"{[v[1] for v in results.values()]}")
    if "cell-gather" in results:
        print(f"speedup cell->cell-gather: "
              f"{b/results['cell-gather'][0]:.2f}x")


if __name__ == "__main__":
    sys.exit(main())
