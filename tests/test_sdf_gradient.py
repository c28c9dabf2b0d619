"""Autograd SDF gradients (the reference's gradient helper) + map resume."""

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import fusion, nn as bnn, tables
from bnv_fusion_tpu.checkpoint import load_pretrained
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.pipeline import NeuralMap


def test_sdf_gradient_points_along_surface_normal(pretrained_tcnn_path, rng):
    """Fuse a plane; decoded SDF gradients must align with the surface.

    The pretrained decoder's convention: SDF is positive OPPOSITE the input
    normal (the pipeline therefore negates camera-facing normals before
    encoding — see pipeline._fuse_step_body).  Feeding -z normals here makes
    the SDF increase along +z, so gradients must point +z.
    """
    params = load_pretrained(pretrained_tcnn_path)
    params = jax.tree.map(jnp.asarray, params)
    bound_min = jnp.asarray(np.array([-1, -1, -1], np.float32))
    bound_max = jnp.asarray(np.array([1, 1, 1], np.float32))
    vs = 0.05
    # plane z=0.012 (off the voxel lattice so both corner layers populate)
    xy = (rng.rand(4000, 2).astype(np.float32) * 1.2 - 0.6)
    pts = np.concatenate([xy, np.full((4000, 1), 0.012, np.float32)], -1)
    normals = np.tile(np.array([[0, 0, -1.0]], np.float32), (4000, 1))
    t = tables.create_table(8, 1 << 15, n_xyz=[44, 44, 44])
    # fuse the frame 3x so accumulated weights pass the decode min-pts mask
    for _ in range(3):
        t, _ = fusion.fuse_frame(t, params, jnp.asarray(pts),
                                 jnp.asarray(normals),
                                 jnp.ones((4000,), bool), bound_min,
                                 bound_max, vs, 2)
    q = jnp.asarray(np.concatenate(
        [xy[:256] * 0.5, np.full((256, 1), 0.02, np.float32)], -1))
    sdf = np.asarray(fusion.decode_points(
        t.features, t, params, q, bound_min, vs, 2))
    valid = sdf != vs  # min-pts-masked voxels decode to the fallback
    assert valid.mean() > 0.4
    g = np.asarray(fusion.sdf_gradient(
        t.features, t, params, q, bound_min, vs, 2))[valid]
    # gradients normalized and pointing along +z (away from the -z normals)
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-3)
    assert (g[:, 2] > 0.7).mean() > 0.95


def test_neuralmap_load_map_roundtrip(pretrained_tcnn_path, tmp_path):
    cfg = load_config([
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=4", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ])
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(4):
        nm.integrate(ds[i])
    prefix = str(tmp_path / "map")
    nm.save(prefix)

    nm2 = NeuralMap(ds.dimensions, cfg, params)
    nm2.load_map(prefix)
    np.testing.assert_allclose(np.asarray(nm2.tsdf_vol.sdf),
                               np.asarray(nm.tsdf_vol.sdf), atol=1e-6)
    k1, f1, w1, _, _ = tables.active_entries(nm.table)
    k2, f2, w2, _, _ = tables.active_entries(nm2.table)
    o1, o2 = np.lexsort(k1.T), np.lexsort(k2.T)
    np.testing.assert_array_equal(k1[o1], k2[o2])
    np.testing.assert_allclose(f1[o1], f2[o2], atol=1e-6)
    # resumed map keeps fusing
    nm2.integrate(ds[0])
