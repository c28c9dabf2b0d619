"""Tests for auxiliary utilities: motion, vis, voxel extras, geometry extras."""

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import geometry as geo
from bnv_fusion_tpu import voxel
from bnv_fusion_tpu.mesh import Mesh, laplacian_smooth, post_process_mesh
from bnv_fusion_tpu.utils import motion, vis


# ------------------------- motion -------------------------

def test_so3_exp_log_roundtrip(rng):
    for _ in range(20):
        w = rng.randn(3) * 1.5
        R = motion.so3_exp(w)
        # rotation matrix sanity
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        w2 = motion.so3_log(R)
        np.testing.assert_allclose(motion.so3_exp(w2), R, atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = rng.randn(6)
        T = motion.se3_exp(xi)
        xi2 = motion.se3_log(T)
        np.testing.assert_allclose(motion.se3_exp(xi2), T, atol=1e-6)


def test_isometry_compose_apply(rng):
    T1 = motion.Isometry(motion.se3_exp(rng.randn(6)))
    T2 = motion.Isometry(motion.se3_exp(rng.randn(6)))
    pts = rng.randn(10, 3)
    out = (T1 @ T2) @ pts
    expected = T1 @ (T2 @ pts)
    np.testing.assert_allclose(out, expected, atol=1e-9)
    back = T1.inv() @ (T1 @ pts)
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_pose_spline_endpoints(rng):
    T0 = np.eye(4)
    T1 = motion.se3_exp(np.array([0.5, 0, 0, 0, 0, np.pi / 4]))
    out = motion.pose_spline([T0, T1], 5)
    np.testing.assert_allclose(out[0], T0, atol=1e-9)
    np.testing.assert_allclose(out[-1], T1, atol=1e-7)
    # midpoint rotation angle is half
    mid_w = motion.so3_log(out[2][:3, :3])
    assert abs(np.linalg.norm(mid_w) - np.pi / 8) < 1e-6


# ------------------------- voxel extras -------------------------

def test_depth_to_tsdf_plane():
    depth = jnp.ones((60, 80), jnp.float32) * 2.0
    intr = jnp.asarray(np.array([[100.0, 0, 40], [0, 100, 30], [0, 0, 1]],
                                np.float32))
    T_wc = jnp.eye(4)
    q = jnp.asarray(np.array([[0, 0, 1.9], [0, 0, 2.1], [0, 0, 0.5],
                              [5, 5, 1.0]], np.float32))
    sdf = np.asarray(voxel.depth_to_tsdf(depth, intr, T_wc, q, 0.15))
    assert abs(sdf[0] - 0.1) < 1e-5       # in front of surface
    assert abs(sdf[1] + 0.1) < 1e-5       # behind
    assert sdf[2] == 0.15                  # far in front -> +trunc
    assert sdf[3] == 0.15                  # outside frustum -> +trunc


def test_grid_transform_identity_and_shift():
    src = jnp.asarray(np.random.RandomState(0).rand(8, 8, 8).astype(np.float32))
    same = voxel.grid_transform(src, [0, 0, 0], 1.0, [0, 0, 0], 1.0, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(same), np.asarray(src), atol=1e-6)
    # half-voxel shift interpolates between neighbors
    shifted = voxel.grid_transform(src, [0, 0, 0], 1.0, [0.5, 0, 0], 1.0,
                                   (7, 8, 8))
    expect = 0.5 * (np.asarray(src)[:-1] + np.asarray(src)[1:])
    np.testing.assert_allclose(np.asarray(shifted), expect, atol=1e-5)


def test_voxel_traversal_axis_ray():
    visited = voxel.voxel_traversal([0.5, 0.5, 0.5], [1, 0, 0], 4.0,
                                    [10, 10, 10])
    np.testing.assert_array_equal(visited[:, 1:], 0)
    np.testing.assert_array_equal(visited[:, 0], np.arange(len(visited)))
    assert len(visited) >= 4


def test_voxel_traversal_diagonal_connected():
    visited = voxel.voxel_traversal([0.1, 0.1, 0.1], [1, 1, 1], 5.0,
                                    [10, 10, 10])
    # consecutive voxels differ by exactly one axis step (6-connectivity)
    diffs = np.abs(np.diff(visited, axis=0)).sum(-1)
    assert (diffs == 1).all()


def test_get_frustrum_range():
    intr = np.array([[100.0, 0, 40], [0, 100, 30], [0, 0, 1]])
    mn, mx, res = voxel.get_frustrum_range(intr, 60, 80, 2.0, 0.1)
    assert mn[2] == 0 and mx[2] == 2.0
    assert mx[0] > 0.5 and mn[0] < -0.5
    assert (res > 0).all()


def test_is_active():
    flags = jnp.zeros((4, 4, 4), bool).at[1, 2, 3].set(True)
    c = jnp.asarray(np.array([[1, 2, 3], [0, 0, 0], [9, 0, 0], [-1, 0, 0]],
                             np.int32))
    out = np.asarray(voxel.is_active(c, flags, [4, 4, 4]))
    np.testing.assert_array_equal(out, [True, False, False, False])


# ------------------------- geometry extras -------------------------

def test_aabb_iou_giou():
    a = np.array([[0, 0, 0], [2, 2, 2.0]])
    b = np.array([[1, 1, 1], [3, 3, 3.0]])
    assert abs(geo.aabb_intersection(a, b) - 1.0) < 1e-9
    assert abs(geo.aabb_iou(a, b) - 1 / 15) < 1e-9
    assert geo.aabb_giou(a, a) == 1.0
    # disjoint boxes: IoU 0, GIoU negative
    c = np.array([[10, 10, 10], [11, 11, 11.0]])
    assert geo.aabb_iou(a, c) == 0.0
    assert geo.aabb_giou(a, c) < 0.0


def test_depth_noise_simulator_statistics():
    sim = geo.DepthNoiseSimulator(seed=0)
    depth = np.full((200, 200), 2.0, np.float32)
    depth[:10] = 0.0  # invalid region stays invalid
    noisy = sim.simulate(depth)
    assert (noisy[:10] == 0).all()
    err = noisy[20:] - 2.0
    expected_sigma = 0.0012 + 0.0019 * (2.0 - 0.4) ** 2
    assert abs(err.std() - expected_sigma) < expected_sigma * 0.5
    assert abs(err.mean()) < 1e-3


# ------------------------- mesh post-process / vis -------------------------

def _noisy_sphere_mesh(rng):
    from bnv_fusion_tpu.datasets.synth_scene import SceneSpec, SphereObj, gt_mesh

    scene = SceneSpec(spheres=[SphereObj(np.zeros(3, np.float32), 0.5)])
    m = gt_mesh(scene, bounds=0.7, resolution=32)
    noisy = m.vertices + rng.randn(*m.vertices.shape).astype(np.float32) * 0.01
    return Mesh(noisy, m.faces)


def test_laplacian_smooth_reduces_roughness(rng):
    m = _noisy_sphere_mesh(rng)
    sm = laplacian_smooth(m, iterations=3)
    r0 = np.std(np.linalg.norm(m.vertices, axis=-1))
    r1 = np.std(np.linalg.norm(sm.vertices, axis=-1))
    assert r1 < r0
    assert sm.faces.shape == m.faces.shape


def test_post_process_mesh_pipeline(rng):
    m = _noisy_sphere_mesh(rng)
    out = post_process_mesh(m, vertex_threshold=1e-4)
    assert len(out.vertices) <= len(m.vertices)
    assert len(out.faces) > 0


def test_colorize_and_pointcloud(tmp_path, rng):
    depth = np.abs(rng.rand(30, 40).astype(np.float32)) + 0.5
    depth[0, 0] = 0
    rgb = vis.colorize_depth(depth)
    assert rgb.shape == (30, 40, 3) and rgb.dtype == np.uint8
    assert (rgb[0, 0] == 0).all()

    pts = rng.rand(50, 3).astype(np.float32)
    colors = (rng.rand(50, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "pc.ply")
    vis.save_pointcloud_ply(path, pts, colors)
    import os

    assert os.path.getsize(path) > 50 * 15
