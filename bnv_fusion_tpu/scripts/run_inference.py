"""Batch inference runner: fuse + refine every sequence of a dataset sweep.

One CLI covering the reference's four per-dataset runners
(reference src/scripts/run_inference_on_{scene3d,icl_nuim,scannet,arkit}.py),
including their per-dataset operating points (voxel size, ray max dist, skip)
— invoked in-process instead of via subprocess.

    python -m bnv_fusion_tpu.scripts.run_inference scene3d \\
        --seqs lounge copyroom --checkpoint pretrained/pointnet_tcnn.ckpt \\
        --data_dir data/fusion/scene3d
"""

from __future__ import annotations

import argparse
import sys

from bnv_fusion_tpu.utils.logging import get_logger

log = get_logger(__name__)

# per-dataset operating points (reference run_inference_on_*.py)
OPERATING_POINTS = {
    "scene3d": {"voxel_size": 0.01, "ray_max_dist": 3, "skip": 10,
                "dataset": "fusion_inference_dataset"},
    "icl_nuim": {"voxel_size": 0.02, "ray_max_dist": 5, "skip": 10,
                 "dataset": "fusion_inference_dataset"},
    "scannet": {"voxel_size": 0.02, "ray_max_dist": 5, "skip": 10,
                "dataset": "fusion_inference_dataset_scannet"},
    "arkit": {"voxel_size": 0.02, "ray_max_dist": 3, "skip": 1,
              "dataset": "fusion_inference_dataset_arkit"},
    # compaction widths sized to the MEASURED device-f32 occupancy at this
    # operating point (profiling/probe_seg_count.py 0.02: max 16937 unique
    # cells / 30531 unique corners per frame): u_cell=32768 keeps the
    # stage-2 sort input at 8*u_cell = 2^18 (pow2 — lax.sort's bitonic
    # network pads to the next power of two, so non-pow2 widths LOSE, see
    # RESULTS.md), corners 49152 = 1.6x margin.  Measured: bench 40.1 ->
    # 54.5 fps at voxel 0.02, overflow 0 (zero-overflow width changes keep
    # voxels/counts/weights exact; feature sums move only within f32
    # summation-order noise — pinned by the width-invariance test).
    # Only the synthetic point carries
    # them: real ScanNet/ICL scenes at max_depth 5 are unmeasured — they
    # keep the safe defaults; size per scene with probe_seg_count.py.
    "synthetic": {"voxel_size": 0.02, "ray_max_dist": 3, "skip": 1,
                  "dataset": "synthetic_demo",
                  "max_unique_cells_per_frame": 32768,
                  "max_unique_per_frame": 49152},
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=sorted(OPERATING_POINTS))
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--min_pts_in_grid", type=int, default=8)
    ap.add_argument("--mode", choices=["e2e", "fuse_refine"], default="e2e",
                    help="e2e = online pipeline; fuse_refine = offline "
                         "test.py fuse then refiner (reference sweep flow)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional config overrides appended per sequence")
    args = ap.parse_args(argv)

    op = OPERATING_POINTS[args.kind]
    failures = []
    for seq in args.seqs:
        overrides = [
            f"dataset={op['dataset']}",
            f"dataset.scan_id={seq}",
            f"dataset.skip_images={op['skip']}",
            f"model.voxel_size={op['voxel_size']}",
            f"model.ray_tracer.ray_max_dist={op['ray_max_dist']}",
            f"model.min_pts_in_grid={args.min_pts_in_grid}",
            f"trainer.checkpoint={args.checkpoint}",
        ]
        for width_key in ("max_unique_cells_per_frame",
                          "max_unique_per_frame"):
            if width_key in op:
                overrides.append(f"model.{width_key}={op[width_key]}")
        if args.data_dir:
            overrides.append(f"data_dir={args.data_dir}")
        overrides += list(args.extra)
        try:
            if args.mode == "e2e":
                from bnv_fusion_tpu.run_e2e import main as e2e_main

                e2e_main(overrides)
            else:
                from bnv_fusion_tpu.test import main as test_main
                from bnv_fusion_tpu.train import main as train_main

                test_main(overrides)
                scan = seq.split("/")[-1]
                train_main(overrides + [
                    "model=fusion_refiner_model",
                    f"model.sparse_volume_path=logs/test/{scan}/"
                    f"{scan}_sparse_volume.npz",
                    f"model.tsdf_prior_path=logs/test/{scan}/{scan}_tsdf.npy",
                ])
            log.info(f"finished {seq}")
        except Exception as e:  # keep sweeping; report at the end
            log.error(f"sequence {seq} failed: {e}")
            failures.append(seq)
    if failures:
        log.error(f"failed sequences: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
