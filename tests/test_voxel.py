"""Unit tests for voxel index math (closed-form expectations)."""

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import voxel


def test_get_world_range_matches_reference_semantics():
    dims = np.array([5.0, 4.0, 3.0])
    vs = 0.25
    mn, mx, n = voxel.get_world_range(dims, vs)
    # min = -d/2 - vs, max snapped so that max = min + n*vs
    np.testing.assert_allclose(mn, -dims / 2 - vs, rtol=1e-6)
    np.testing.assert_allclose(mx, mn + n * vs, rtol=1e-6)
    assert np.all(mx >= dims / 2 + vs - 1e-6)
    assert n.dtype == np.int32


def test_flatten_unflatten_roundtrip(rng):
    n_xyz = np.array([53, 71, 29], np.int32)
    coords = np.stack([rng.randint(0, n_xyz[i], 1000) for i in range(3)],
                      axis=-1).astype(np.int32)
    flat = voxel.flatten_coords(jnp.asarray(coords), n_xyz)
    back = voxel.unflatten_ids(flat, n_xyz)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_corner_neighbors_non_integer():
    c = jnp.array([[1.25, 2.5, 3.75]])
    corners = np.asarray(voxel.corner_neighbors(c))[0]
    assert corners.shape == (8, 3)
    # floor/ceil corners of the containing cell, reference order
    expected_first = np.array([1, 2, 3])
    expected_last = np.array([2, 3, 4])
    np.testing.assert_array_equal(corners[0], expected_first)
    np.testing.assert_array_equal(corners[7], expected_last)
    # all 8 distinct for strictly fractional coords
    assert len({tuple(r) for r in corners}) == 8


def test_corner_neighbors_integer_coords_collapse():
    c = jnp.array([[2.0, 3.0, 4.0]])
    corners = np.asarray(voxel.corner_neighbors(c))[0]
    # floor == ceil at integers -> all corners identical
    assert len({tuple(r) for r in corners}) == 1


def test_trilinear_weights_sum_to_one_and_interpolate(rng):
    pts = jnp.asarray(rng.rand(64, 3) * 10)
    corners = voxel.corner_neighbors(pts)
    w = np.asarray(voxel.trilinear_weights(pts, corners))
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    # interpolating corner positions with the weights returns the point
    interp = (np.asarray(corners) * w[..., None]).sum(-2)
    np.testing.assert_allclose(interp, np.asarray(pts), atol=1e-4)


def test_trilinear_weights_at_integer_coords():
    pts = jnp.array([[3.0, 4.0, 5.0]])
    corners = voxel.corner_neighbors(pts)
    w = np.asarray(voxel.trilinear_weights(pts, corners))
    # 8 duplicate corners each get 1/8 after normalization
    np.testing.assert_allclose(w, 1.0 / 8, atol=1e-6)
