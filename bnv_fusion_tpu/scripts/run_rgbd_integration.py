"""Classical TSDF-fusion baseline (reference src/scripts/run_rgbd_intergration.py).

The reference wraps Open3D's ScalableTSDFVolume; here the same baseline runs
on this framework's own jitted dense TSDF (bnv_fusion_tpu.tsdf) + marching
tetrahedra — a neural-free reference point for quality comparisons.

    python -m bnv_fusion_tpu.scripts.run_rgbd_integration \\
        dataset=synthetic_demo model.tsdf_voxel_size=0.02
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import mesh as mesh_mod
from bnv_fusion_tpu import tsdf
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def integrate_sequence(dataset, voxel_size: float):
    vol, trunc = tsdf.create_tsdf_volume(dataset.dimensions, voxel_size)
    for i in range(len(dataset)):
        f = dataset[i]
        vol = tsdf.integrate(vol, jnp.asarray(f["depth"], jnp.float32),
                             jnp.asarray(f["intr_mat"], jnp.float32),
                             jnp.asarray(f["T_wc"], jnp.float32), voxel_size)
    return vol


def tsdf_to_mesh(vol: tsdf.TSDFVolume, voxel_size: float):
    sdf = np.asarray(vol.sdf)
    w = np.asarray(vol.weight)
    observed = w > 0
    dx, dy, dz = sdf.shape
    # cells whose 8 corners are all observed and cross the level set
    corner_off = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                           for z in (0, 1)])
    base = np.stack(np.meshgrid(np.arange(dx - 1), np.arange(dy - 1),
                                np.arange(dz - 1), indexing="ij"),
                    -1).reshape(-1, 3)
    cs = np.stack([sdf[base[:, 0] + o[0], base[:, 1] + o[1],
                       base[:, 2] + o[2]] for o in corner_off], -1)
    co = np.stack([observed[base[:, 0] + o[0], base[:, 1] + o[1],
                            base[:, 2] + o[2]] for o in corner_off], -1)
    keep = co.all(1) & (cs.min(1) < 0) & (cs.max(1) > 0)
    out = mesh_mod.marching_tetrahedra(base[keep], cs[keep])
    if len(out.vertices) == 0:
        return None
    verts = out.vertices * voxel_size + np.asarray(vol.origin)
    return mesh_mod.merge_vertices(
        mesh_mod.Mesh(verts.astype(np.float32), out.faces), voxel_size / 4)


def main(argv=None):
    cfg = load_config(list(argv if argv is not None else sys.argv[1:]))
    from bnv_fusion_tpu.datasets import get_dataset

    dataset = get_dataset(cfg, "val")
    voxel_size = float(getattr(cfg.model, "tsdf_voxel_size", 0.02))
    vol = integrate_sequence(dataset, voxel_size)
    m = tsdf_to_mesh(vol, voxel_size)
    scan_id = cfg.dataset.scan_id.split("/")[-1]
    out_dir = os.path.join(cfg.output_dir, "rgbd_integration")
    os.makedirs(out_dir, exist_ok=True)
    if m is None:
        log.warning("no surface extracted")
        return 1
    out = os.path.join(out_dir, f"{scan_id}_tsdf.ply")
    mesh_mod.save_ply(out, m)
    log.info(f"exported {out} ({len(m.vertices)} verts)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
