"""Global refinement as offline training over a saved sparse volume.

Rebuilds LitFusionRefiner (reference src/models/fusion/fusion_refiner.py):
load a fused sparse volume (the hand-off from offline fusion, reference
test.py flow) plus an optional dense TSDF prior ``.npy``, freeze the decoder
weights, make the latents trainable, and optimize them with the rendering
loss against the dataset's frames; export a mesh per validation epoch.

Here the refinement loop IS the pipeline's optimize step (one jitted Adam
update per frame batch) — the reference reimplements the ray/loss path in a
LightningModule; this framework shares one implementation.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import mesh as mesh_mod
from bnv_fusion_tpu import tsdf as tsdf_mod
from bnv_fusion_tpu.models.registry import register
from bnv_fusion_tpu.pipeline import NeuralMap
from bnv_fusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


@register("lit_fusion_refiner")
class FusionRefiner:
    def __init__(self, cfg, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params

    def run(self, dataset, working_dir: str, n_epochs: int = 1,
            iters_per_epoch: int | None = None) -> mesh_mod.Mesh | None:
        cfg = self.cfg
        nmap = NeuralMap(dataset.dimensions, cfg, self.params, working_dir)
        self.nmap = nmap

        vol_path = getattr(cfg.model, "sparse_volume_path", None)
        if vol_path:
            log.info(f"loading sparse volume {vol_path}")
            nmap.load_volume(vol_path)
        tsdf_path = getattr(cfg.model, "tsdf_prior_path", None)
        metric = None
        if not tsdf_path and bool(getattr(cfg.model,
                                          "prior_from_noisy_depth", False)):
            # build the prior the way the reference's training data does
            # (fusion_dataset.py:243-251): accumulate noise-degraded depth
            # TSDFs over the sequence at the model voxel size, then resample
            # onto the prior grid like any loaded .npy
            log.info("accumulating noisy-depth tsdf prior from the dataset")
            from bnv_fusion_tpu import geometry, voxel as vx

            sim = geometry.DepthNoiseSimulator(
                seed=int(getattr(cfg.trainer, "seed", 0)))
            mn, _, n_xyz = vx.get_world_range(dataset.dimensions,
                                              nmap.voxel_size)
            res = tuple(int(x) for x in n_xyz)
            frames = [dataset[i] for i in range(len(dataset))]
            sdf, _ = tsdf_mod.accumulate_tsdf_window(
                [sim.simulate(np.asarray(f["depth"], np.float32))
                 for f in frames],
                [f["T_wc"] for f in frames],
                [f["intr_mat"] for f in frames],
                mn, res, nmap.voxel_size)
            metric = np.asarray(sdf)
        if tsdf_path:
            log.info(f"loading tsdf prior {tsdf_path}")
            metric = np.load(tsdf_path)
        if metric is not None:
            dst_shape = nmap.tsdf_vol.sdf.shape
            if metric.shape != dst_shape:
                # Resample a prior saved at a different resolution onto the
                # volume grid, matching the reference's trilinear resize
                # (fusion_refiner.py:105-114, F.interpolate align_corners=True:
                # src index = dst index * (S-1)/(D-1) per axis).
                log.info(f"resampling tsdf prior {metric.shape} -> {dst_shape}")
                from bnv_fusion_tpu import voxel as vx
                src_per_dst = (
                    (np.asarray(metric.shape, np.float64) - 1.0)
                    / np.maximum(np.asarray(dst_shape, np.float64) - 1.0, 1.0))
                metric = np.asarray(vx.grid_transform(
                    jnp.asarray(metric, jnp.float32),
                    src_min=jnp.zeros(3, jnp.float32),
                    src_voxel=jnp.ones(3, jnp.float32),
                    dst_min=jnp.zeros(3, jnp.float32),
                    dst_voxel=jnp.asarray(src_per_dst, jnp.float32),
                    dst_shape=dst_shape))
            normalized = metric / (nmap.tsdf_voxel_size * 5.0)
            nmap.tsdf_vol = nmap.tsdf_vol.replace(
                sdf=jnp.asarray(normalized, jnp.float32),
                weight=jnp.ones_like(nmap.tsdf_vol.weight))

        # stage the dataset frames as the optimization ray pool
        for i in range(len(dataset)):
            f = dataset[i]
            nmap.frames.append({
                "depth": jnp.asarray(f["depth"], jnp.float32),
                "T_wc": jnp.asarray(f["T_wc"], jnp.float32),
                "intr": jnp.asarray(f["intr_mat"], jnp.float32),
                "frame_id": f.get("frame_id"),
            })

        iters = iters_per_epoch or len(nmap.frames)
        mesh = None
        os.makedirs(working_dir, exist_ok=True)
        # reference refiner schedule: one full sequential pass over ALL
        # frames per epoch (fusion_refiner.py:288-315); "random" opts into
        # the online loop's i.i.d. sampling instead
        order = str(getattr(cfg.model, "refine_frame_order", "epoch"))
        for epoch in range(n_epochs):
            nmap.optimize(n_iters=iters, last_frame=-1,
                          lr=float(cfg.optimizer.lr.initial),
                          frame_order=order)
            mesh = nmap.extract_mesh()
            if mesh is not None:
                out = os.path.join(working_dir, f"refined_{epoch}.ply")
                mesh_mod.save_ply(out, mesh)
                log.info(f"epoch {epoch}: exported {out} "
                         f"({len(mesh.vertices)} verts)")
        nmap.save(os.path.join(working_dir, "refined"))
        return mesh
