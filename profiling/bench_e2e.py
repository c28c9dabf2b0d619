"""End-to-end fps at the lounge operating point (VERDICT round-2 item 3).

The reference's 2-5 fps claim is END-TO-END (reference README.md:17:
local fusion + periodic/final global optimization + meshing); bench.py's
headline is local fusion only.  This measures the comparable figure: fuse
all 48 frames (K=8 merged launches), run the reference-formula global
optimization (n_frames * skip iterations, run_e2e.py:284-287), extract
the final mesh — wall time from first frame to final mesh, compiles
excluded by a warmup pass over a disposable map.

Prints one JSON line {metric, value, unit, vs_baseline}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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

    # the canonical bench operating point (keep in sync with bench.py —
    # the quality gate validates exactly this configuration).  The optimize
    # schedule is the tuned production preset (configs/preset/fast_e2e.yaml:
    # 64 iters, epoch frame order, lr 2e-3, sequential ray chunks, 12 fine
    # + 4 coarse samples/ray), two-scene quality-gated with >= 0.5pp margin
    # inside the 1% parity bar (RESULTS.md round-5 sweep; demo scene
    # F 0.9894 @2.5cm / 0.9210 @1cm vs the reference formula's
    # 0.9935 / 0.9044).  The sample-count knee: n_fine=12 passes, 10 fails;
    # coarse cuts 15 -> 4 are free (fine band supervision is load-bearing).
    # trainer.global_steps=48 is the fastest gate-passing point (10.18 fps
    # best-of-3, +0.13pp margin) if you want the speed end of the curve.
    cfg = load_config([
        "preset=fast_e2e",
        "model.voxel_size=0.01",
        "dataset.num_images=48",
        "dataset.img_res=[480,640]",
        "dataset.stage_raw_depth=true",
        "model.max_unique_per_frame=116736",
    ] + os.environ.get("BNV_BENCH_OVERRIDES", "").split())
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(len(ds))]
    k = int(os.environ.get("BNV_BENCH_K", "16"))
    skip = int(getattr(cfg.dataset, "skip_images", 1)) or 1
    # trainer.global_steps > 0 overrides the reference formula (same routing
    # as run_e2e.py); trainer.optim_early_stop makes it a ceiling
    n_iters = int(getattr(cfg.trainer, "global_steps", 0) or 0)
    if n_iters <= 0:
        n_iters = len(frames) * max(skip, 1) * 2  # run_e2e.py:284-287

    def run(measure):
        nm = NeuralMap(ds.dimensions, cfg, params)
        t0 = time.time()
        nm.integrate_batches([frames[i:i + k]
                              for i in range(0, len(frames) - k + 1, k)])
        # block_until_ready does NOT block on the axon backend — drain the
        # async queue with a scalar fetch so phases attribute honestly
        _ = np.asarray(nm.table.weights[:1])
        t_local = time.time() - t0
        t1 = time.time()
        nm.optimize(n_iters, lr=float(cfg.optimizer.lr.initial))
        _ = np.asarray(nm.table.features[:1, :1])
        t_global = time.time() - t1
        t2 = time.time()
        mesh = nm.extract_mesh(use_delta=True)
        t_mesh = time.time() - t2
        total = time.time() - t0
        if measure:
            print(f"local {t_local:.2f}s  global {t_global:.2f}s "
                  f"({getattr(nm, 'last_optimize_iters', n_iters)}/"
                  f"{n_iters} iters)  mesh {t_mesh:.2f}s "
                  f"({len(mesh.vertices)} verts)  total {total:.2f}s",
                  file=sys.stderr)
        return total

    run(measure=False)               # warmup: compile everything
    # best-of-N: the 1-vCPU host's steal time makes the (host-side) mesh
    # phase a lottery (measured 2-5x swings, RESULTS.md); noise only ever
    # adds time, so min-of-N is the honest figure
    n_passes = int(os.environ.get("BNV_BENCH_PASSES", "3"))
    totals = [run(measure=True) for _ in range(n_passes)]
    fps_passes = sorted(len(frames) / t for t in totals)
    fps = fps_passes[-1]
    print(json.dumps({
        "metric": f"END-TO-END fps @ voxel {float(cfg.model.voxel_size):g}, "
                  "480x640, 48 frames (local fusion + quality-gated "
                  f"{n_iters}-iter global optimization + final mesh; vs "
                  "reference's 2-5 fps end-to-end claim)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 5.0, 3),
        "passes": [round(f, 3) for f in fps_passes],
        "median": round(fps_passes[len(fps_passes) // 2], 3),
        "spread": round(fps_passes[-1] - fps_passes[0], 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
