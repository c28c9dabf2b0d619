"""Spatially sharded table: per-voxel results match the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import fusion, nn as bnn, table_dense as tbd, voxel
from bnv_fusion_tpu.parallel.mesh import make_mesh
from bnv_fusion_tpu.parallel.spatial import (create_spatial_table,
                                             make_spatial_decode,
                                             make_spatial_fuse_frame,
                                             spatial_active_entries)

N_XYZ = [24, 24, 24]  # 13824 voxels, divisible by 8


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis_name="sp")


def _scene(rng, n=512):
    bound_min = np.array([-1.0, -1.0, -1.0], np.float32)
    bound_max = np.array([1.0, 1.0, 1.0], np.float32)
    pts = (rng.rand(n, 3).astype(np.float32) * 1.2 - 0.6)
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return bound_min, bound_max, pts, normals


def test_spatial_fuse_matches_single_device(rng, params, mesh):
    bound_min, bound_max, pts, normals = _scene(rng)
    vs, min_pts = 0.1, 2
    valid = jnp.ones((len(pts),), bool)

    ref = tbd.create_dense_table(N_XYZ, 4096, 8)
    ref, sref = fusion.fuse_frame(
        ref, params, jnp.asarray(pts), jnp.asarray(normals), valid,
        jnp.asarray(bound_min), jnp.asarray(bound_max), vs, min_pts)

    table = create_spatial_table(mesh, N_XYZ, 4096, 8)
    step = make_spatial_fuse_frame(mesh, params, vs, min_pts,
                                   max_unique=2048)
    table, stats = step(table, jnp.asarray(pts), jnp.asarray(normals), valid,
                        jnp.asarray(bound_min), jnp.asarray(bound_max))

    # gather shard entries host-side and compare per-voxel values
    coords_sh, feats_sh, w_sh, h_sh = spatial_active_entries(table, 8)
    got = {tuple(c): (f, w, h)
           for c, f, w, h in zip(coords_sh, feats_sh, w_sh, h_sh)}

    kref, fref, wref, href, _ = tbd.active_entries(ref)
    assert len(got) == len(kref)
    for c, f, w, h in zip(kref, fref, wref, href):
        gf, gw, gh = got[tuple(c)]
        np.testing.assert_allclose(gw, w, atol=1e-5)
        np.testing.assert_allclose(gf, f, atol=1e-4, rtol=1e-4)
        # num_hits parity: the observation gate (mesh_require_observation)
        # must see the same evidence on the sharded path
        np.testing.assert_allclose(gh, h, atol=1e-5)
    assert abs(float(stats.n_touched) - len(kref)) < 1e-5
    # a fused map must carry real observations (non-zero num_hits somewhere)
    assert float(np.sum(h_sh)) > 0


def test_spatial_decode_matches_single_device(rng, params, mesh):
    bound_min, bound_max, pts, normals = _scene(rng, 1024)
    vs, min_pts = 0.1, 1
    valid = jnp.ones((len(pts),), bool)

    ref = tbd.create_dense_table(N_XYZ, 4096, 8)
    ref, _ = fusion.fuse_frame(
        ref, params, jnp.asarray(pts), jnp.asarray(normals), valid,
        jnp.asarray(bound_min), jnp.asarray(bound_max), vs, min_pts)

    table = create_spatial_table(mesh, N_XYZ, 4096, 8)
    step = make_spatial_fuse_frame(mesh, params, vs, min_pts,
                                   max_unique=2048)
    table, _ = step(table, jnp.asarray(pts), jnp.asarray(normals), valid,
                    jnp.asarray(bound_min), jnp.asarray(bound_max))

    q = jnp.asarray(rng.rand(256, 3).astype(np.float32) * 20 + 1)
    ref_sdf = fusion.decode_points(ref.features, ref, params, q,
                                   jnp.asarray(bound_min), vs, min_pts,
                                   is_coords=True)
    dec = make_spatial_decode(mesh, params, vs, min_pts)
    got = dec(table, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_sdf),
                               atol=1e-4, rtol=1e-4)
