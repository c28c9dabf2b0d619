"""Quality gate at the bench operating point: full e2e -> F @2.5cm / @1cm.

Runs the exact pipeline the bench measures (voxel 0.01, 480x640, 48 frames,
K=16 merged launches, reference-formula global optimization, final mesh)
and scores the mesh against the analytic scene's OBSERVED ground-truth
surface points (datasets/synth_scene.py gt_observed_points — the union of
back-projected depth pixels, so unseen surface doesn't count as missing).

The bar (BASELINE.md / driver): F within 1% of the PyTorch reference;
operationally we gate changes against this script's own reference point:
**F 0.9935 @2.5cm / 0.9044 @1cm** (measured identical at HEAD and at the
39.0-fps commit 8cc0b48, so the number is stable across late round 3).
Historical ad-hoc gate numbers quoted in RESULTS.md (0.9931/0.9172) came
from earlier inline scripts with a different protocol and are NOT
comparable at the third decimal — always A/B with THIS script.

Usage:
    python profiling/quality_gate.py                 # gate the defaults
    BNV_QG_OVERRIDES="model.max_unique_per_batch=458752" \
        python profiling/quality_gate.py             # gate an A/B config

Prints one JSON line {"f_2p5cm", "f_1cm", "precision_*", "recall_*", ...}.
"""

import json
import os
import sys

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
    from bnv_fusion_tpu.evaluation import fscore_points
    from bnv_fusion_tpu.mesh import sample_surface
    from bnv_fusion_tpu.pipeline import NeuralMap

    # mirror bench.py's canonical operating point
    overrides = [
        "model.voxel_size=0.01",
        "dataset.num_images=48",
        "dataset.img_res=[480,640]",
        "dataset.stage_raw_depth=true",
        "model.tsdf_every=4",
        "model.max_unique_per_frame=116736",
    ]
    overrides += os.environ.get("BNV_QG_OVERRIDES", "").split()
    cfg = load_config(overrides)
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(len(ds))]
    k = int(os.environ.get("BNV_BENCH_K", "16"))
    skip = int(getattr(cfg.dataset, "skip_images", 1)) or 1
    # trainer.global_steps > 0 overrides the reference formula (same routing
    # as run_e2e.py), so BNV_QG_OVERRIDES can gate alternative schedules
    n_iters = int(getattr(cfg.trainer, "global_steps", 0) or 0)
    if n_iters <= 0:
        n_iters = len(frames) * max(skip, 1) * 2  # run_e2e.py:284-287

    nm = NeuralMap(ds.dimensions, cfg, params)
    nm.integrate_batches([frames[i:i + k]
                          for i in range(0, len(frames) - k + 1, k)])
    tail = len(frames) % k
    if tail:
        for f in frames[len(frames) - tail:]:
            nm.integrate(f)
    overflow = int(np.asarray(nm.table.overflow))
    nm.optimize(n_iters, lr=float(cfg.optimizer.lr.initial))
    mesh = nm.extract_mesh(use_delta=True)

    pred_pts = sample_surface(mesh, 100000, seed=0)
    gt_pts = ds.gt_observed_points(100000, seed=0)
    r25 = fscore_points(pred_pts, gt_pts, 0.025)
    r10 = fscore_points(pred_pts, gt_pts, 0.01)
    print(json.dumps({
        "f_2p5cm": round(r25["fscore"], 4),
        "f_1cm": round(r10["fscore"], 4),
        "p_2p5cm": round(r25["precision"], 4),
        "r_2p5cm": round(r25["recall"], 4),
        "p_1cm": round(r10["precision"], 4),
        "r_1cm": round(r10["recall"], 4),
        "overflow": overflow,
        "k": k,
        "iters_run": int(getattr(nm, "last_optimize_iters", n_iters)),
        "overrides": os.environ.get("BNV_QG_OVERRIDES", ""),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
