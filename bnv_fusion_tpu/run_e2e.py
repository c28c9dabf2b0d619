"""Online end-to-end reconstruction entry point.

CLI-compatible rebuild of reference src/run_e2e.py:205-296:

    python -m bnv_fusion_tpu.run_e2e model=fusion_pointnet_model \\
        dataset=fusion_inference_dataset dataset.scan_id=scene3d/lounge \\
        trainer.checkpoint=pretrained/pointnet_tcnn.ckpt

Streams posed depth frames, runs per-frame local fusion (jitted device step),
periodic demo-mode optimization, the final global optimization, and exports
``before_optim.ply`` / ``final.ply`` plus the map state — printing per-phase
fps like the reference (src/run_e2e.py:289-290).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from bnv_fusion_tpu import evaluation
from bnv_fusion_tpu import mesh as mesh_mod
from bnv_fusion_tpu.checkpoint import load_pretrained
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.nn import init_model
from bnv_fusion_tpu.pipeline import NeuralMap
from bnv_fusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def load_params(cfg):
    """Load weights: reference .ckpt (both formats) or this framework's .npz."""
    ckpt = getattr(cfg.trainer, "checkpoint", None)
    if ckpt:
        log.info(f"loading pretrained weights from {ckpt}")
        if str(ckpt).endswith(".npz"):
            from bnv_fusion_tpu.checkpoint import load_state

            state = load_state(ckpt)
            return state.get("params", state)
        return load_pretrained(ckpt)
    log.warning("no trainer.checkpoint given — using random weights")
    import jax
    return jax.tree.map(np.asarray, init_model(jax.random.key(0)))


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config(overrides)
    from bnv_fusion_tpu.datasets import get_dataset  # registers readers

    dataset = get_dataset(cfg, "val")
    params = load_params(cfg)

    scan_id = cfg.dataset.scan_id.split("/")[-1]
    working_dir = os.path.join(cfg.output_dir, "run_e2e", scan_id)
    os.makedirs(working_dir, exist_ok=True)

    nmap = NeuralMap(dataset.dimensions, cfg, params, working_dir)
    demo_mode = cfg.model.mode == "demo"
    optim_interval = int(getattr(cfg.model, "optim_interval", 100))
    skip = int(getattr(cfg.dataset, "skip_images", 1)) or 1

    # throughput mode: fuse K frames per device launch (identical sequential
    # semantics; amortizes the ~65 ms/launch dispatch overhead).  In demo
    # mode the merge window is bounded at every optimize/mesh event frame so
    # periodic optimization still sees the exact prefix of the stream (mesh
    # staleness bounded by K frames; pick K dividing optim_interval to keep
    # the flush sizes — and so the compiled fuse programs — to {1, K}).
    batch_k = int(getattr(cfg.model, "integrate_batch_size", 1))
    use_batch = batch_k > 1
    pending = []

    # live monitoring (the reference's optional pangolin window,
    # src/utils/pangolin_helper.py — here an HTTP page, display-less-safe)
    viewer = None
    viewer_port = int(getattr(cfg.trainer, "live_viewer_port", 0) or 0)
    if viewer_port:
        from bnv_fusion_tpu.utils.live_viewer import LiveViewer

        viewer = LiveViewer(port=viewer_port)
        log.info(f"live viewer at http://127.0.0.1:{viewer.port}/")

    log.info(f"fusing {len(dataset)} frames (scan {cfg.dataset.scan_id})")
    for idx in range(len(dataset)):
        frame = dataset[idx]
        nmap.timer.start("local")
        if use_batch:
            pending.append(frame)
            if (len(pending) == batch_k or idx == len(dataset) - 1
                    or (demo_mode and idx % optim_interval == 0)):
                if len(pending) == 1:  # reuse the per-frame program
                    nmap.integrate(pending[0])
                else:
                    nmap.integrate_batch(pending)
                pending = []
        else:
            nmap.integrate(frame)
        nmap.timer.log("local")
        if demo_mode and idx % optim_interval == 0 and nmap.frames:
            last = max(0, len(nmap.frames) - optim_interval)
            n_iters = min(len(nmap.frames), optim_interval) * skip
            nmap.timer.start("global")
            nmap.optimize(n_iters=n_iters, last_frame=last)
            nmap.timer.log("global")
            # incremental cache: only changed voxels are re-decoded
            m = nmap.extract_mesh_incremental()
            if m is not None:
                mesh_mod.save_ply(os.path.join(working_dir, f"{idx}.ply"), m)
                if viewer is not None:
                    viewer.publish(m, status={
                        "frames": idx + 1,
                        "local_s": round(nmap.timer.times["local"], 2),
                        "global_s": round(nmap.timer.times["global"], 2)})

    # surface width misfits instead of dropping voxels silently (the static
    # compaction widths count overflow on device; ADVICE round-3 item 2)
    nmap._note_overflow(flush=True)
    if nmap.overflow > 0:
        log.warning(
            f"table overflow = {nmap.overflow}: the compaction widths "
            f"(model.max_unique_per_frame / max_unique_cells_per_frame) "
            f"dropped observations — widen them or set them to 'auto'")

    m = nmap.extract_mesh()
    if m is not None:
        mesh_mod.save_ply(os.path.join(working_dir, "before_optim.ply"), m)
        log.info(f"before_optim mesh: {len(m.vertices)} verts")

    # reference formula (run_e2e.py:263-268): n_frames * skip, doubled
    # outside demo mode.  trainer.global_steps > 0 overrides it outright.
    global_steps = int(getattr(cfg.trainer, "global_steps", 0) or 0)
    if global_steps <= 0:
        global_steps = int(len(nmap.frames) * skip)
        if not demo_mode:
            global_steps *= 2
    nmap.timer.start("global")
    nmap.optimize(n_iters=global_steps, last_frame=-1)
    nmap.timer.log("global")

    for phase in ("local", "global"):
        t = nmap.timer.times[phase]
        fps = global_steps / t if t > 0 else float("inf")
        # same formula as the reference printout (run_e2e.py:289-290; note it
        # divides global_steps by BOTH phases' times, compile time included)
        print(f"speed on {phase} fusion: {fps:.2f} fps")
    t_local = nmap.timer.times["local"]
    if t_local > 0:
        print(f"local fusion throughput: "
              f"{len(nmap.frames) / t_local:.2f} frames/s "
              f"({len(nmap.frames)} frames, compile included)")

    m = nmap.extract_mesh()
    if m is not None:
        # final post-process: vertex merge @ voxel/4 + 1-iter smoothing
        # (reference run_e2e.py:292-293, o3d_helper.post_process_mesh)
        if bool(getattr(cfg.trainer, "post_process", True)):
            m = mesh_mod.post_process_mesh(
                m, vertex_threshold=nmap.voxel_size / 4)
        mesh_mod.save_ply(os.path.join(working_dir, "final.ply"), m)
        log.info(f"final mesh: {len(m.vertices)} verts -> "
                 f"{working_dir}/final.ply")
    nmap.save(os.path.join(working_dir, "final"))

    # self-contained quality report for datasets with analytic ground truth
    if m is not None and hasattr(dataset, "gt_observed_points"):
        pred = mesh_mod.sample_surface(m, 100000, 0)
        gt = dataset.gt_observed_points(100000)
        for t in (0.025, 0.01):
            res = evaluation.fscore_points(pred, gt, t)
            print(f"F-score @{t}: {res['fscore']:.4f} "
                  f"(precision {res['precision']:.4f}, "
                  f"recall {res['recall']:.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
