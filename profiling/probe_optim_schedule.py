"""Rays-per-iteration vs iteration-count at fixed total rays (round-4 item 1a).

The optimize phase is 80% of the e2e wall (RESULTS.md): 96 iters x 134 ms
at 5000 rays/iter = 12.9 s.  The per-iteration cost is latency-structural
(bf16 neutral, groups 8/16 worse, chunk-vmap only 8%) — so if the 134 ms
floor is latency and not FLOPs, multiplying rays/iter should be nearly
free, and the reference's total-ray budget (5000 x 96 = 480k rays,
reference src/run_e2e.py:284-290 schedule x configs/dataset num_pixels)
can be spent in far fewer launches.

This probe fuses the bench map once per schedule (fresh NeuralMap — the
donated optimize launches consume the table) and times nm.optimize for
each (num_pixels, train_ray_splits, n_iters) point at the SAME 480k total
rays.  Quality is gated separately (profiling/quality_gate.py with
BNV_QG_OVERRIDES + BNV_QG_ITERS).

Usage: python profiling/probe_optim_schedule.py [schedule-index ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (num_pixels, train_ray_splits, n_iters) — all 480k total rays
SCHEDULES = [
    (5000, 1000, 96),    # baseline: the reference formula
    (10000, 2000, 48),   # 2x rays, same 5-chunk structure
    (10000, 1000, 48),   # 2x rays, 10 chunks of 1000
    (20000, 4000, 24),   # 4x rays, 5 chunks
    (20000, 2000, 24),   # 4x rays, 10 chunks
    (40000, 8000, 12),   # 8x rays, 5 chunks
    # round-4 late: the DOWNWARD direction (only upward was probed; the
    # 5000->10000 scaling is super-linear, so a negative intercept predicts
    # sub-linear savings going down — measure before gating quality).
    # n_iters here is only a timing divisor; quality is gated separately.
    (2500, 2500, 48),    # half rays, 1 chunk
    (2500, 500, 48),     # half rays, 5 chunks (reference chunk structure)
    (3000, 1000, 48),    # 0.6x rays, 3 chunks
    (5000, 5000, 48),    # control at 5000 rays, 1 chunk
]


# extra config overrides (space-separated), e.g. the shipped sample counts:
# BNV_PROBE_OVERRIDES="model.ray_tracer.n_fine=12 model.ray_tracer.n_coarse=4"
EXTRA = os.environ.get("BNV_PROBE_OVERRIDES", "").split()


def main(indices):
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

    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    results = []
    for idx in indices:
        n_rays, splits, n_iters = SCHEDULES[idx]
        cfg = load_config([
            "model.voxel_size=0.01",
            "dataset.num_images=48",
            "dataset.img_res=[480,640]",
            "dataset.stage_raw_depth=true",
            "model.tsdf_every=4",
            "model.max_unique_per_frame=116736",
            f"dataset.num_pixels={n_rays}",
            f"model.train_ray_splits={splits}",
        ] + EXTRA)
        ds = get_dataset(cfg, "val")
        frames = [ds[i] for i in range(len(ds))]
        k = 16

        def fused_map():
            nm = NeuralMap(ds.dimensions, cfg, params)
            nm.integrate_batches([frames[i:i + k]
                                  for i in range(0, len(frames) - k + 1, k)])
            _ = np.asarray(nm.table.weights[:1])
            return nm

        # warmup pass: compiles the optimize step for this (rays, splits)
        nm = fused_map()
        t0 = time.time()
        nm.optimize(min(8, n_iters))
        _ = np.asarray(nm.table.features[:1, :1])
        t_compile = time.time() - t0
        # timed pass on a fresh map
        nm = fused_map()
        t0 = time.time()
        nm.optimize(n_iters)
        _ = np.asarray(nm.table.features[:1, :1])
        t = time.time() - t0
        row = {"num_pixels": n_rays, "splits": splits, "n_iters": n_iters,
               "total_s": round(t, 2), "ms_per_iter": round(1e3 * t / n_iters, 1),
               "compile_pass_s": round(t_compile, 1), "extra": EXTRA}
        print(json.dumps(row), flush=True)
        results.append(row)
    print(json.dumps({"schedules": results}))
    return 0


if __name__ == "__main__":
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(SCHEDULES)))
    sys.exit(main(idxs))
