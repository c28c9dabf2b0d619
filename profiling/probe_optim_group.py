"""Optimize-phase wall vs optim_iters_per_launch (dispatch amortization).

The e2e bench's global phase runs 96 Adam iterations at 169 ms/iter wall
against a ~145 ms/iter device floor (RESULTS.md).  self.frames already
holds DEVICE arrays (pipeline.integrate_batch keeps the staged depths),
so the per-launch cost is dispatch + 3 jnp.stack + 2 RNG ops — all
amortized by the launch group size.  This measures optimize(96) wall at
group = 4 / 8 / 16 / 24 on the real chip.

Usage: python profiling/probe_optim_group.py [groups...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    groups = [int(g) for g in sys.argv[1:]] or [4, 8, 16, 24]

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    extra = os.environ.get("BNV_PROBE_OVERRIDES", "").split()
    cfg = load_config([
        "model.voxel_size=0.01",
        "dataset.num_images=48",
        "dataset.img_res=[480,640]",
        "dataset.stage_raw_depth=true",
    ] + extra)
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(len(ds))]
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(0, len(frames) - 8 + 1, 8):
        nm.integrate_batch(frames[i:i + 8])
    _ = np.asarray(nm.table.weights[:1])

    n_iters = 96
    for g in groups:
        nm.config.model.optim_iters_per_launch = g
        nm._optim_step = None  # force rebuild at the new group size
        t0 = time.time()
        nm.optimize(n_iters)
        _ = np.asarray(nm.table.features[:1, :1])
        t_compile = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            nm.optimize(n_iters)
            _ = np.asarray(nm.table.features[:1, :1])
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"group={g:3d}: first {t_compile:6.1f}s, warm "
              f"{best:6.2f}s = {best*1000/n_iters:6.1f} ms/iter  "
              f"(runs: {['%.2f' % t for t in ts]})", flush=True)


if __name__ == "__main__":
    sys.exit(main())
