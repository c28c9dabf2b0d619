"""Geometry unit tests (closed-form expectations)."""

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import geometry as geo


def _intr(fx=500.0, fy=500.0, cx=320.0, cy=240.0):
    return jnp.asarray(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32))


def test_depth_to_xyz_principal_point():
    depth = jnp.ones((480, 640), jnp.float32) * 2.0
    xyz = np.asarray(geo.depth_to_xyz(depth, _intr()))
    # pixel at the principal point back-projects onto the optical axis
    np.testing.assert_allclose(xyz[240, 320], [0, 0, 2.0], atol=1e-5)
    # one pixel right of center: x = z/fx
    np.testing.assert_allclose(xyz[240, 321], [2.0 / 500, 0, 2.0], atol=1e-5)


def test_depth_to_xyz_projects_back(rng):
    intr = _intr()
    depth = jnp.asarray(1.0 + rng.rand(48, 64).astype(np.float32))
    xyz = np.asarray(geo.depth_to_xyz(depth, intr))
    K = np.asarray(intr)
    uvw = xyz @ K.T
    u = uvw[..., 0] / uvw[..., 2]
    v = uvw[..., 1] / uvw[..., 2]
    uu, vv = np.meshgrid(np.arange(64), np.arange(48))
    np.testing.assert_allclose(u, uu, atol=1e-3)
    np.testing.assert_allclose(v, vv, atol=1e-3)


def test_normals_flat_plane_faces_camera():
    # fronto-parallel plane at z=2 -> normal must be (0, 0, -1) (toward camera)
    depth = jnp.ones((100, 100), jnp.float32) * 2.0
    n = np.asarray(geo.normals_from_depth(depth, _intr(cx=50, cy=50)))
    inner = n[10:-10, 10:-10]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-2)
    np.testing.assert_allclose(inner[..., :2], 0.0, atol=5e-2)


def test_normals_tilted_plane():
    # plane z = 1 + 0.2 * X (world slope along x) viewed fronto-parallel
    intr = _intr(fx=100, fy=100, cx=50, cy=50)
    u = np.arange(100, dtype=np.float32)
    # z = 1 / (1 - 0.2*(u-cx)/fx) gives x-slope 0.2 plane: derive directly
    # from plane eq z - 0.2*x = 1 with x = (u-cx)/fx * z
    denom = 1.0 - 0.2 * (u[None, :] - 50) / 100
    depth = jnp.asarray(np.repeat(1.0 / denom, 100, axis=0).astype(np.float32))
    n = np.asarray(geo.normals_from_depth(depth, intr))
    inner = n[40:60, 40:60].reshape(-1, 3)
    expected = np.array([0.2, 0.0, -1.0])
    expected = expected / np.linalg.norm(expected)
    np.testing.assert_allclose(inner.mean(0), expected, atol=2e-2)


def test_normals_no_border_wrap():
    # a plane tilted along x: a wrap-around difference at columns 0 / W-1
    # would mix opposite image edges (large depth jump) and corrupt border
    # normals; with one-sided differences every pixel matches the interior.
    intr = _intr(fx=100, fy=100, cx=50, cy=50)
    u = np.arange(100, dtype=np.float32)
    denom = 1.0 - 0.2 * (u[None, :] - 50) / 100
    depth = jnp.asarray(np.repeat(1.0 / denom, 100, axis=0).astype(np.float32))
    n = np.asarray(geo.normals_from_depth(depth, intr))
    expected = np.array([0.2, 0.0, -1.0])
    expected = expected / np.linalg.norm(expected)
    for border in (n[0], n[-1], n[:, 0], n[:, -1]):
        np.testing.assert_allclose(border, np.broadcast_to(expected, border.shape),
                                   atol=5e-2)


def test_camera_rays_identity_pose():
    intr = _intr()
    uv = jnp.asarray(np.array([[320.0, 240.0], [820.0, 240.0]], np.float32))
    dirs, loc = geo.get_camera_rays(uv, jnp.eye(4), intr)
    np.testing.assert_allclose(np.asarray(loc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dirs)[0], [0, 0, 1], atol=1e-6)
    d1 = np.asarray(dirs)[1]
    np.testing.assert_allclose(d1, np.array([1, 0, 1]) / np.sqrt(2), atol=1e-6)


def test_camera_rays_translated_pose():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, 2.0, 3.0]
    dirs, loc = geo.get_camera_rays(
        jnp.asarray(np.array([[320.0, 240.0]], np.float32)), jnp.asarray(T), _intr())
    np.testing.assert_allclose(np.asarray(loc), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dirs)[0], [0, 0, 1], atol=1e-6)


def test_gather_pixel_neighborhoods():
    xyz = np.zeros((10, 12, 3), np.float32)
    xyz[..., 0] = np.arange(12)[None, :]
    xyz[..., 1] = np.arange(10)[:, None]
    mask = np.ones((10, 12), bool)
    mask[5, 6] = False
    uv = jnp.asarray(np.array([[6, 5], [0, 0]], np.int32))
    pts, m = geo.gather_pixel_neighborhoods(
        jnp.asarray(xyz), jnp.asarray(mask), uv, 3)
    pts, m = np.asarray(pts), np.asarray(m)
    assert pts.shape == (2, 9, 3)
    # center of first window is (6, 5); its mask entry is False
    center = pts[0, 4]
    np.testing.assert_allclose(center[:2], [6, 5])
    assert not m[0, 4]
    # border clamping: window around (0,0) stays in bounds
    assert (pts[1, :, 0] >= 0).all() and (pts[1, :, 1] >= 0).all()
