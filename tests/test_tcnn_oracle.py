"""Oracle for the tcnn checkpoint unpacking (the production default).

``pointnet_tcnn.ckpt`` stores two flat FullyFusedMLP param blobs whose layout
is reverse-engineered in checkpoint.unpack_tcnn_mlp (reference
src/models/tcnn_config.json, src/utils/pointnet_utils.py:269-294).  Blob-size
arithmetic alone cannot detect a wrong-but-size-compatible layout guess, so
these tests pin the unpacking three ways:

1. A decode-on-fused-plane invariant: fuse an analytic wall and require the
   decoded SDF to be ~0 on-surface, positive on the camera side, and
   monotonically decreasing through the surface.  Garbage weights cannot
   satisfy this.
2. The same invariant must hold for the torch-golden checkpoint
   (pointnet.ckpt, verified weight-by-weight against torch CPU in
   test_nn_golden.py) — anchoring that the bar itself is correct.
3. Perturbing the assumed packing (transposing a hidden layer, reversing the
   layer order) must BREAK the invariant — i.e. the test would fail if
   unpack_tcnn_mlp's layout guess were wrong.

test_cross_checkpoint_fscore_parity additionally fuses the same synthetic
scene with both checkpoints and requires the before-optim F-scores to land
within a few points, bounding end-to-end unpacking error.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bnv_fusion_tpu import fusion, geometry as geo, tables as tbl
from bnv_fusion_tpu.checkpoint import (
    convert_pointnet_tcnn, load_pretrained, load_torch_checkpoint)

VOXEL = 0.1
WALL_Z = 2.03  # off-lattice so both corner planes accumulate observations


def _fuse_wall(params):
    """Fuse a fronto-parallel wall 3x (weights must exceed min_pts=2)."""
    h, w = 60, 80
    intr = jnp.asarray(
        np.array([[50.0, 0, 40], [0, 50, 30], [0, 0, 1]], np.float32))
    depth = jnp.ones((h, w), jnp.float32) * WALL_Z
    xyz = geo.depth_to_xyz(depth, intr)
    normals = -np.asarray(geo.normals_from_depth(depth, intr))
    pts = jnp.asarray(np.asarray(xyz).reshape(-1, 3))
    nrm = jnp.asarray(normals.reshape(-1, 3))
    valid = jnp.ones((pts.shape[0],), bool)
    bmin = jnp.asarray(np.array([-3, -3, 0], np.float32))
    bmax = jnp.asarray(np.array([3, 3, 4], np.float32))
    table = tbl.create_table(8, 1 << 15, n_xyz=[60, 60, 40])
    for _ in range(3):
        table, _ = fusion.fuse_frame(table, params, pts, nrm, valid,
                                     bmin, bmax, VOXEL, 2)
    return table, bmin


def _decode_across_wall(table, bmin, params):
    zs = np.array([2.005, 2.02, WALL_Z, 2.05, 2.09], np.float32)
    probe = jnp.asarray(np.stack(
        [np.zeros_like(zs), np.zeros_like(zs), zs], -1))
    return np.asarray(fusion.decode_points(
        table.features, table, params, probe, bmin, VOXEL, 2))


def _plane_invariant_holds(params) -> bool:
    table, bmin = _fuse_wall(params)
    sdf = _decode_across_wall(table, bmin, params)
    on_surface_ok = abs(sdf[2]) < 0.3 * VOXEL
    sign_ok = sdf[0] > 0 > sdf[-1]
    monotone_ok = bool(np.all(np.diff(sdf) < 0))
    return bool(on_surface_ok and sign_ok and monotone_ok)


def test_tcnn_checkpoint_decodes_fused_plane(pretrained_tcnn_path):
    params = load_pretrained(pretrained_tcnn_path)
    assert _plane_invariant_holds(params)


def test_torch_checkpoint_same_invariant(pretrained_torch_path):
    params = load_pretrained(pretrained_torch_path)
    assert _plane_invariant_holds(params)


@pytest.mark.parametrize("which", ["decoder", "encoder"])
def test_transposed_hidden_layer_breaks_invariant(pretrained_tcnn_path, which):
    """A transposed hidden-layer interpretation of the same flat blob must
    fail the plane invariant — proof the invariant discriminates layout."""
    params = load_pretrained(pretrained_tcnn_path)
    bad = {k: dict(v) for k, v in params.items()}
    bad[which]["w1"] = params[which]["w1"].T
    bad[which]["w2"] = params[which]["w2"].T
    assert not _plane_invariant_holds(bad)


def test_reversed_layer_order_breaks_invariant(pretrained_tcnn_path):
    """Reading the hidden 64x64 blocks of the flat blob in reverse order
    (a plausible alternative packing) must fail the plane invariant."""
    sd = load_torch_checkpoint(pretrained_tcnn_path)["state_dict"]
    params = convert_pointnet_tcnn(sd)
    bad = {k: dict(v) for k, v in params.items()}
    for net in ("encoder", "decoder"):
        bad[net]["w1"], bad[net]["w2"] = params[net]["w2"], params[net]["w1"]
    assert not _plane_invariant_holds(bad)


def test_cross_checkpoint_fscore_parity(pretrained_tcnn_path,
                                        pretrained_torch_path):
    """Fuse the same synthetic scene with the tcnn and the torch-golden
    checkpoint; before-optim F-scores must land within a few points
    (BASELINE bar: quality parity should not hinge on the unpacking guess)."""
    from bnv_fusion_tpu import evaluation
    from bnv_fusion_tpu import mesh as mesh_mod
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        "model.voxel_size=0.04",
        "dataset.num_images=12",
        "dataset.img_res=[240,320]",
        "dataset.num_pixels=1024",
        "model.train_ray_splits=256",
        "model.table_capacity=262144",
        "model.min_pts_in_grid=4",
    ])
    ds = get_dataset(cfg, "val")
    gt = ds.gt_observed_points(20000)

    scores = {}
    for name, path in (("tcnn", pretrained_tcnn_path),
                       ("torch", pretrained_torch_path)):
        params = load_pretrained(path)
        nm = NeuralMap(ds.dimensions, cfg, params)
        for i in range(len(ds)):
            nm.integrate(ds[i])
        m = nm.extract_mesh(use_delta=True)
        assert m is not None and len(m.vertices) > 500
        pred = mesh_mod.sample_surface(m, 20000, 0)
        scores[name] = evaluation.fscore_points(pred, gt, 0.05)["fscore"]

    # at this light 12-frame operating point the absolute F is recall-limited
    # (~0.5 for both checkpoints); wrong unpacking would give ~0.  The parity
    # bound is the oracle: both checkpoints must reconstruct comparably.
    assert scores["tcnn"] > 0.4, scores
    assert scores["torch"] > 0.4, scores
    assert abs(scores["tcnn"] - scores["torch"]) < 0.15, scores
