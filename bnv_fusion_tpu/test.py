"""Offline sequence fusion entry point (feeds the refiner).

CLI-compatible rebuild of reference src/test.py + the test_step flow of
LitFusionPointNet (reference src/models/fusion/local_point_fusion.py:736-864):
fuse a whole sequence with local fusion only, export ``{scene}.ply`` and the
sparse-volume state for bnv_fusion_tpu.train's refiner stage.

    python -m bnv_fusion_tpu.test model=fusion_pointnet_model \\
        dataset=synthetic_demo trainer.checkpoint=pretrained/pointnet_tcnn.ckpt
"""

from __future__ import annotations

import os
import sys

import numpy as np

from bnv_fusion_tpu import mesh as mesh_mod
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.pipeline import NeuralMap
from bnv_fusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv=None):
    cfg = load_config(list(argv if argv is not None else sys.argv[1:]))
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.run_e2e import load_params

    dataset = get_dataset(cfg, "test")
    params = load_params(cfg)
    scan_id = cfg.dataset.scan_id.split("/")[-1]
    out_dir = os.path.join(cfg.output_dir, "test", scan_id)
    os.makedirs(out_dir, exist_ok=True)

    nmap = NeuralMap(dataset.dimensions, cfg, params, out_dir)
    for i in range(len(dataset)):
        nmap.integrate(dataset[i])
    if nmap.stats:
        s = np.asarray(nmap.stats)
        p25, p50, p75 = np.percentile(s, [25, 50, 75])
        log.info(f"pts/voxel: 25% {p25:.1f} 50% {p50:.1f} 75% {p75:.1f} "
                 f"mean {s.mean():.1f} min {s.min():.1f} max {s.max():.1f}")

    m = nmap.extract_mesh()
    if m is not None:
        out = os.path.join(out_dir, f"{scan_id}.ply")
        mesh_mod.save_ply(out, m)
        log.info(f"exported {out} ({len(m.vertices)} verts)")
    nmap.save(os.path.join(out_dir, scan_id))
    log.info(f"sparse volume saved under {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
