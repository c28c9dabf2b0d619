"""Big-scene integrate cost: the 790M-voxel block-table scene (round-2
RESULTS "Block-table scale": 202 ms/frame, TSDF-window bound) re-measured
with the round-3 block-major frustum-exact TSDF prior + seg-reduce kernel.

Usage: python profiling/profile_bigscene.py [voxel] [K] [tsdf_layout]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    layout = sys.argv[3] if len(sys.argv) > 3 else "auto"

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap
    from bnv_fusion_tpu import tsdf

    cfg = load_config([
        f"model.voxel_size={voxel}",
        "dataset.num_images=24",
        "dataset.img_res=[480,640]",
        "model.table_capacity=2097152",
        f"model.tsdf_layout={layout}",
        "dataset.stage_raw_depth=true",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    dims = np.array([14.0, 14.0, 4.0], np.float32)  # 790M fine voxels @1cm
    nm = NeuralMap(dims, cfg, params)
    n_vox = float(np.prod(np.asarray(nm.n_xyz)))
    print(f"fine voxels {n_vox/1e6:.0f}M, prior type "
          f"{type(nm.tsdf_vol).__name__}", flush=True)
    if hasattr(nm.tsdf_vol, "nb_xyz"):
        print(f"prior blocks {np.prod(nm.tsdf_vol.nb_xyz)/1e6:.2f}M")

    frames = [ds[i] for i in range(len(ds))]
    batches = [frames[i:i + k] for i in range(0, len(frames) - k + 1, k)]
    t0 = time.time()
    nm.integrate_batch(batches[0])
    _ = np.asarray(nm.table.weights[:1])
    print(f"first batch (compile) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for b in batches[1:]:
        nm.integrate_batch(b)
    _ = np.asarray(nm.table.weights[:1])
    dt = time.time() - t0
    n = sum(len(b) for b in batches[1:])
    print(f"integrate: {dt*1000/n:.1f} ms/frame warm ({n} frames)")
    print(f"table overflow {int(np.asarray(nm.table.overflow))}")
    if hasattr(nm.tsdf_vol, "overflow"):
        print(f"tsdf block overflow {int(np.asarray(nm.tsdf_vol.overflow))}")


if __name__ == "__main__":
    sys.exit(main())
