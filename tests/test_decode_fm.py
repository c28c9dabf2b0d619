"""Feature-major decode parity: decode_points_fm == decode_points
(values, masks, prior blending, gradients) on dense and block tables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import fusion, nn as bnn
from bnv_fusion_tpu import table_blocks as tbb, table_dense as tbd
from bnv_fusion_tpu.checkpoint import load_pretrained


def _fused_table(make_table, params, rng, n=400):
    bound_min = np.array([-1.0, -1.0, -1.0], np.float32)
    vs = 0.1
    pts = (rng.rand(n, 3).astype(np.float32) * 1.2 - 0.6)
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    t = make_table()
    t, _ = fusion.fuse_frame(
        t, params, jnp.asarray(pts), jnp.asarray(normals),
        jnp.ones((n,), bool), jnp.asarray(bound_min),
        jnp.asarray(-bound_min), vs, 2, max_unique=4096)
    # decode masks on weight >= min_pts: lift fused voxels above it (one
    # frame only accumulates min(cnt/32, 1) <= 1)
    t = t.replace(weights=jnp.where(t.weights > 0, 8.0, 0.0))
    return t, bound_min, vs


@pytest.mark.parametrize("kind", ["dense", "blocks"])
@pytest.mark.parametrize("use_delta", [False, True])
def test_decode_fm_matches_rows(kind, use_delta, pretrained_tcnn_path):
    params = load_pretrained(pretrained_tcnn_path)
    rng = np.random.RandomState(4)
    make = ((lambda: tbd.create_dense_table([24, 24, 24], 4096, 8))
            if kind == "dense"
            else (lambda: tbb.create_block_table([24, 24, 24], 11**3*64, 8)))
    t, bound_min, vs = _fused_table(make, params, rng)
    n_xyz = jnp.asarray([24, 24, 24], jnp.int32)
    sdf_delta = (jnp.asarray(rng.randn(10, 11, 12).astype(np.float32)) * 0.01
                 if use_delta else None)
    # queries: near fused voxels + random (many masked) + exact coords mode
    qpts = jnp.asarray(rng.uniform(-0.9, 0.9, (3000, 3)).astype(np.float32))

    a = fusion.decode_points(t.features, t, params, qpts,
                             jnp.asarray(bound_min), vs, 2,
                             sdf_delta=sdf_delta, n_xyz=n_xyz,
                             masked_fill=float("nan"))
    b = fusion.decode_points_fm(t.features, t, params, qpts,
                                jnp.asarray(bound_min), vs, 2,
                                sdf_delta=sdf_delta, n_xyz=n_xyz,
                                masked_fill=float("nan"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5, equal_nan=True)
    # both produce some live values (the comparison is not vacuous)
    assert np.isfinite(np.asarray(a)).sum() > 50


def test_decode_fm_grads_match(pretrained_tcnn_path):
    params = load_pretrained(pretrained_tcnn_path)
    rng = np.random.RandomState(5)
    t, bound_min, vs = _fused_table(
        lambda: tbd.create_dense_table([24, 24, 24], 4096, 8), params, rng)
    qpts = jnp.asarray(rng.uniform(-0.6, 0.6, (500, 3)).astype(np.float32))

    def loss_rows(f):
        s = fusion.decode_points(f, t, params, qpts,
                                 jnp.asarray(bound_min), vs, 2)
        return jnp.sum(jnp.sin(s))

    def loss_fm(f):
        s = fusion.decode_points_fm(f, t, params, qpts,
                                    jnp.asarray(bound_min), vs, 2)
        return jnp.sum(jnp.sin(s))

    ga = jax.grad(loss_rows)(t.features)
    gb = jax.grad(loss_fm)(t.features)
    assert float(jnp.abs(ga).max()) > 0
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=2e-5, rtol=1e-4)


def test_decode_fm_coords_mode(pretrained_tcnn_path):
    params = load_pretrained(pretrained_tcnn_path)
    rng = np.random.RandomState(6)
    t, bound_min, vs = _fused_table(
        lambda: tbd.create_dense_table([24, 24, 24], 4096, 8), params, rng)
    coords = jnp.asarray(rng.uniform(1.0, 22.0, (800, 3)).astype(np.float32))
    a = fusion.decode_points(t.features, t, params, coords,
                             jnp.asarray(bound_min), vs, 2, is_coords=True)
    b = fusion.decode_points_fm(t.features, t, params, coords,
                                jnp.asarray(bound_min), vs, 2,
                                is_coords=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)
