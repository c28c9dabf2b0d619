"""Refiner loss-neighborhood A/B: the reference's 15x15 window vs 3x3.

The reference refiner trains with a 15x15 pixel neighborhood around each
sampled ray (fusion_dataset.py:349-374 builds the neighbor stacks); the
online loop uses 3x3.  model.neighbor_kernel plumbs the window through
optimize.build_rays_from_frame; the refiner config defaults to 15
(configs/model/fusion_refiner_model.yaml).  VERDICT round-3 item 10 asks
for the measured quality delta of actually running 15 vs 3 through the
refiner flow — this probe records it.

CPU-friendly (small analytic scene, fuse once, refine twice).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
           python profiling/probe_refiner_kernel.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bnv_fusion_tpu import evaluation
    from bnv_fusion_tpu import mesh as mesh_mod
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.models.fusion_refiner import FusionRefiner
    from bnv_fusion_tpu.pipeline import NeuralMap

    import tempfile

    work = tempfile.mkdtemp(prefix="refiner_kernel_")
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")

    def cfg_for(kernel: int):
        return load_config([
            "model=fusion_refiner_model",
            "dataset=synthetic_demo",
            "dataset.num_images=12",
            "dataset.img_res=[240,320]",
            "dataset.num_pixels=1024",
            "model.voxel_size=0.04",
            "model.min_pts_in_grid=1",
            "model.train_ray_splits=256",
            "model.table_capacity=262144",
            f"model.neighbor_kernel={kernel}",
        ])

    # fuse once (fusion does not read neighbor_kernel)
    base = cfg_for(15)
    ds = get_dataset(base, "val")
    nm = NeuralMap(ds.dimensions, base, params)
    for i in range(len(ds)):
        nm.integrate(ds[i])
    prefix = os.path.join(work, "scene")
    nm.save(prefix)

    gt_pts = ds.gt_observed_points(20000)
    out = {}
    for kernel in (15, 3):
        cfg = cfg_for(kernel)
        cfg.model.sparse_volume_path = prefix + "_sparse_volume.npz"
        cfg.model.tsdf_prior_path = prefix + "_tsdf.npy"
        refiner = FusionRefiner(cfg, params)
        mesh = refiner.run(ds, os.path.join(work, f"refine{kernel}"),
                           n_epochs=1, iters_per_epoch=24)
        pred = mesh_mod.sample_surface(mesh, 20000, 0)
        r25 = evaluation.fscore_points(pred, gt_pts, 0.025)
        r10 = evaluation.fscore_points(pred, gt_pts, 0.01)
        out[f"k{kernel}"] = {"f_2p5cm": round(r25["fscore"], 4),
                             "f_1cm": round(r10["fscore"], 4),
                             "verts": len(mesh.vertices)}
        print(f"kernel={kernel}: {out[f'k{kernel}']}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
