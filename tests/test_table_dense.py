"""Property tests for the dense slot-map table (mirrors test_table.py) and
facade dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import table_dense as tbd
from bnv_fusion_tpu import tables

N_XYZ = np.array([200, 200, 200], np.int32)


def _random_coords(rng, n, lo=0, hi=200):
    return rng.randint(lo, hi, size=(n, 3)).astype(np.int32)


def test_insert_then_lookup(rng):
    t = tbd.create_dense_table(N_XYZ, 1024, 4)
    coords = np.unique(_random_coords(rng, 300), axis=0)
    t, slots, ok = tbd.insert(t, jnp.asarray(coords),
                              jnp.ones((len(coords),), bool))
    assert np.asarray(ok).all()
    s2, found = tbd.lookup(t, jnp.asarray(coords))
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(slots))
    absent = _random_coords(rng, 50, lo=0, hi=200)
    mask = ~np.isin(
        absent.view([("", absent.dtype)] * 3).reshape(-1),
        coords.view([("", coords.dtype)] * 3).reshape(-1))
    _, found_absent = tbd.lookup(t, jnp.asarray(absent[mask]))
    assert not np.asarray(found_absent).any()


def test_insert_duplicates_one_slot(rng):
    t = tbd.create_dense_table(N_XYZ, 512, 4)
    base = np.unique(_random_coords(rng, 50), axis=0)
    dup = np.concatenate([base] * 3, axis=0)[rng.permutation(len(base) * 3)]
    t, slots, ok = tbd.insert(t, jnp.asarray(dup),
                              jnp.ones((len(dup),), bool))
    assert np.asarray(ok).all()
    by_key = {}
    for c, s in zip(map(tuple, dup), np.asarray(slots)):
        by_key.setdefault(c, set()).add(int(s))
    assert all(len(v) == 1 for v in by_key.values())
    assert int(tbd.occupancy(t)) == len(base)
    # slots are contiguous from 0
    assert set(s for v in by_key.values() for s in v) == set(range(len(base)))


def test_out_of_grid_keys_rejected(rng):
    t = tbd.create_dense_table(N_XYZ, 256, 2)
    coords = np.array([[0, 0, 0], [199, 199, 199], [200, 0, 0], [-1, 5, 5]],
                      np.int32)
    t, slots, ok = tbd.insert(t, jnp.asarray(coords), jnp.ones((4,), bool))
    np.testing.assert_array_equal(np.asarray(ok), [True, True, False, False])


def test_capacity_overflow_counted(rng):
    t = tbd.create_dense_table(N_XYZ, 64, 2)
    coords = np.unique(_random_coords(rng, 200), axis=0)[:100]
    t, slots, ok = tbd.insert(t, jnp.asarray(coords),
                              jnp.ones((len(coords),), bool))
    ok = np.asarray(ok)
    assert ok.sum() == 64
    assert int(np.asarray(t.overflow)) == len(coords) - 64
    # inserted ones still resolve
    s2, found = tbd.lookup(t, jnp.asarray(coords[ok]))
    assert np.asarray(found).all()
    # and their coords round-trip through slot-map inversion
    keys, _, _, _, _ = tbd.active_entries(t)
    got = keys[np.asarray(s2)]
    np.testing.assert_array_equal(got, coords[ok])


def test_incremental_slots_stable(rng):
    t = tbd.create_dense_table(N_XYZ, 2048, 2)
    first = np.unique(_random_coords(rng, 400), axis=0)
    t, s1, _ = tbd.insert(t, jnp.asarray(first),
                          jnp.ones((len(first),), bool))
    for _ in range(3):
        more = _random_coords(rng, 200)
        t, _, _ = tbd.insert(t, jnp.asarray(more),
                             jnp.ones((len(more),), bool))
    s1b, found = tbd.lookup(t, jnp.asarray(first))
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(s1b), np.asarray(s1))


def test_insert_under_jit(rng):
    coords = jnp.asarray(_random_coords(rng, 128))

    @jax.jit
    def step(t, c):
        return tbd.insert(t, c, jnp.ones((c.shape[0],), bool))

    t = tbd.create_dense_table(N_XYZ, 1024, 4)
    t, slots, ok = step(t, coords)
    _, found = tbd.lookup(t, coords)
    assert np.asarray(found).all()


def test_save_load_roundtrip(rng):
    t = tbd.create_dense_table(N_XYZ, 512, 8)
    coords = np.unique(_random_coords(rng, 120), axis=0)
    t, slots, _ = tbd.insert(t, jnp.asarray(coords),
                             jnp.ones((len(coords),), bool))
    feats = jnp.asarray(rng.rand(len(coords), 8).astype(np.float32))
    t = t.replace(features=t.features.at[slots].set(feats),
                  weights=t.weights.at[slots].set(3.0))
    keys, f, w, h, _ = tbd.active_entries(t)
    t2 = tbd.load_entries(N_XYZ, 512, keys, f, w, h)
    s2, found = tbd.lookup(t2, jnp.asarray(coords))
    assert np.asarray(found).all()
    got = np.asarray(t2.features)[np.asarray(s2)]
    order = {tuple(k): i for i, k in enumerate(keys)}
    expect = f[[order[tuple(c)] for c in coords]]
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_too_large_grid_raises():
    with pytest.raises(ValueError):
        tbd.create_dense_table([2048, 2048, 2048], 64, 2)


def test_facade_picks_dense_then_hash():
    from bnv_fusion_tpu import table as tbh

    t = tables.create_table(8, 256, n_xyz=[100, 100, 100])
    assert isinstance(t, tbd.DenseIndexedTable)
    t2 = tables.create_table(8, 256, n_xyz=None)
    assert isinstance(t2, tbh.SparseVoxelTable)


def test_fusion_with_dense_table_matches_hash(rng):
    """fuse_frame through the facade gives identical voxel values for both
    table implementations."""
    from bnv_fusion_tpu import fusion, nn as bnn, table as tbh

    params = jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))
    bound_min = np.array([-1.0, -1.0, -1.0], np.float32)
    bound_max = np.array([1.0, 1.0, 1.0], np.float32)
    vs = 0.1
    pts = (rng.rand(400, 3).astype(np.float32) * 1.2 - 0.6)
    normals = rng.randn(400, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    valid = jnp.ones((400,), bool)

    td = tbd.create_dense_table([24, 24, 24], 4096, 8)
    th = tbh.create_table(4096, 8)
    td, sd = fusion.fuse_frame(td, params, jnp.asarray(pts),
                               jnp.asarray(normals), valid,
                               jnp.asarray(bound_min), jnp.asarray(bound_max),
                               vs, 2)
    th, sh = fusion.fuse_frame(th, params, jnp.asarray(pts),
                               jnp.asarray(normals), valid,
                               jnp.asarray(bound_min), jnp.asarray(bound_max),
                               vs, 2)
    kd, fd, wd, _, _ = tbd.active_entries(td)
    kh, fh, wh, _, _ = tables.active_entries(th)
    od, oh = np.lexsort(kd.T), np.lexsort(kh.T)
    np.testing.assert_array_equal(kd[od], kh[oh])
    np.testing.assert_allclose(wd[od], wh[oh], atol=1e-6)
    # the cell-keyed sort path sums features in a different order than the
    # hash path's scatter accumulation; tolerance covers f32 roundoff only
    np.testing.assert_allclose(fd[od], fh[oh], atol=1e-4, rtol=1e-4)
