"""Property tests for the block-sparse slot-map table (the big-scene route)
and the tables.py routing policy."""

import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import table_blocks as tbb
from bnv_fusion_tpu import table_dense as tbd
from bnv_fusion_tpu import tables

N_XYZ = np.array([200, 200, 200], np.int32)


def _random_coords(rng, n, lo=0, hi=200):
    return rng.randint(lo, hi, size=(n, 3)).astype(np.int32)


def test_insert_then_lookup(rng):
    t = tbb.create_block_table(N_XYZ, 300 * 64, 4)
    coords = np.unique(_random_coords(rng, 300), axis=0)
    t, slots, ok = tbb.insert(t, jnp.asarray(coords),
                              jnp.ones((len(coords),), bool))
    assert np.asarray(ok).all()
    s2, found = tbb.lookup(t, jnp.asarray(coords))
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(slots))
    # a key in an UNALLOCATED block is not found
    far = jnp.asarray(np.array([[199, 199, 199]], np.int32))
    in_any_block = ((coords // 4) == np.array([49, 49, 49])).all(-1).any()
    if not in_any_block:
        _, f = tbb.lookup(t, far)
        assert not np.asarray(f).any()


def test_same_block_shares_allocation(rng):
    t = tbb.create_block_table(N_XYZ, 8 * 64, 4)
    # 64 voxels of one block + 3 voxels of another
    base = np.array([[8, 8, 8]], np.int32)
    block0 = base + np.stack(np.meshgrid(*[np.arange(4)] * 3,
                                         indexing="ij"), -1).reshape(-1, 3)
    other = np.array([[0, 0, 0], [0, 0, 1], [3, 3, 3]], np.int32)
    keys = np.concatenate([block0, other])
    t, slots, ok = tbb.insert(t, jnp.asarray(keys),
                              jnp.ones((len(keys),), bool))
    assert np.asarray(ok).all()
    assert int(t.n_alloc) == 2  # two blocks
    # block0's slots all land in one contiguous 64-slot block
    s = np.asarray(slots)[:64]
    assert s.min() // 64 == s.max() // 64
    assert len(set(s.tolist())) == 64


def test_overflow_counted(rng):
    t = tbb.create_block_table(N_XYZ, 2 * 64, 4)  # room for 2 blocks
    # keys spread over >2 distinct blocks
    coords = np.array([[0, 0, 0], [8, 0, 0], [16, 0, 0], [24, 0, 0]],
                      np.int32)
    t, slots, ok = tbb.insert(t, jnp.asarray(coords),
                              jnp.ones((4,), bool))
    assert int(np.asarray(ok).sum()) == 2
    assert int(t.overflow) == 2


def test_active_entries_load_entries_roundtrip(rng):
    t = tbb.create_block_table(N_XYZ, 128 * 64, 4)
    coords = np.unique(_random_coords(rng, 100), axis=0)
    t, slots, ok = tbb.insert(t, jnp.asarray(coords),
                              jnp.ones((len(coords),), bool))
    feats = rng.rand(len(coords), 4).astype(np.float32)
    t = t.replace(
        features=t.features.at[slots].set(jnp.asarray(feats)),
        weights=t.weights.at[slots].set(1.0),
        num_hits=t.num_hits.at[slots].set(2.0))
    k, f, w, h, idx = tbb.active_entries(t)
    assert len(k) == len(coords)  # zero-weight block padding filtered out
    order = np.lexsort(k.T)
    corder = np.lexsort(coords.T)
    np.testing.assert_array_equal(k[order], coords[corder])
    np.testing.assert_allclose(f[order], feats[corder], atol=1e-6)

    t2 = tables.load_entries(t, k, f, w, h)
    k2, f2, w2, h2, _ = tables.active_entries(t2)
    o2 = np.lexsort(k2.T)
    np.testing.assert_array_equal(k2[o2], k[order])
    np.testing.assert_allclose(f2[o2], f[order], atol=1e-6)
    np.testing.assert_allclose(h2[o2], h[order], atol=1e-6)


def test_fuse_frame_matches_dense(rng, pretrained_tcnn_path):
    """The sort-reduce fuse path must produce identical state on the dense
    and the block table (same scene, same points)."""
    from bnv_fusion_tpu import fusion
    from bnv_fusion_tpu.checkpoint import load_pretrained

    params = load_pretrained(pretrained_tcnn_path)
    n = 2048
    pts = (rng.rand(n, 3).astype(np.float32) - 0.5) * 1.6
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    valid = jnp.ones((n,), bool)
    bmin = jnp.asarray(np.array([-1, -1, -1], np.float32))
    bmax = jnp.asarray(np.array([1, 1, 1], np.float32))
    n_xyz = [44, 44, 44]

    # scattered points touch ~all 11^3 blocks: block tables need
    # block-granular capacity (~64 slots per touched block)
    td = tbd.create_dense_table(n_xyz, 1 << 15, 8)
    tb = tbb.create_block_table(n_xyz, 11 ** 3 * 64, 8)
    args = (params, jnp.asarray(pts), jnp.asarray(normals), valid,
            bmin, bmax, 0.05, 2)
    td, sd = fusion.fuse_frame(td, *args)
    tb, sb = fusion.fuse_frame(tb, *args)
    assert int(sd.n_touched) == int(sb.n_touched)

    kd, fd, wd, hd, _ = tbd.active_entries(td)
    kb, fb, wb, hb, _ = tbb.active_entries(tb)
    od, ob = np.lexsort(kd.T), np.lexsort(kb.T)
    # dense lists every inserted voxel; blocks filter to state-carrying ones
    # (min-pts-dropped voxels have weight 0 in both) — compare on weights > 0
    live_d = wd[od] > 0
    np.testing.assert_array_equal(kd[od][live_d], kb[ob])
    np.testing.assert_allclose(fd[od][live_d], fb[ob], atol=1e-6)
    np.testing.assert_allclose(wd[od][live_d], wb[ob], atol=1e-6)
    np.testing.assert_allclose(hd[od][live_d], hb[ob], atol=1e-6)


def test_decode_matches_dense(rng, pretrained_tcnn_path):
    """SDF decode through the facade must agree between table kinds."""
    from bnv_fusion_tpu import fusion
    from bnv_fusion_tpu.checkpoint import load_pretrained

    params = load_pretrained(pretrained_tcnn_path)
    n = 2048
    pts = (rng.rand(n, 3).astype(np.float32) - 0.5) * 1.2
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    valid = jnp.ones((n,), bool)
    bmin = jnp.asarray(np.array([-1, -1, -1], np.float32))
    bmax = jnp.asarray(np.array([1, 1, 1], np.float32))
    n_xyz = [44, 44, 44]
    args = (params, jnp.asarray(pts), jnp.asarray(normals), valid,
            bmin, bmax, 0.05, 1)
    td, _ = fusion.fuse_frame(tbd.create_dense_table(n_xyz, 1 << 15, 8), *args)
    tb, _ = fusion.fuse_frame(tbb.create_block_table(n_xyz, 11 ** 3 * 64, 8), *args)
    probe = jnp.asarray((rng.rand(128, 3).astype(np.float32) - 0.5) * 1.2)
    sd = fusion.decode_points(td.features, td, params, probe, bmin, 0.05, 1)
    sb = fusion.decode_points(tb.features, tb, params, probe, bmin, 0.05, 1)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sb), atol=1e-6)


def test_routing_policy():
    # small -> dense
    t = tables.create_table(8, 1024, n_xyz=[64, 64, 64])
    assert isinstance(t, tbd.DenseIndexedTable)
    # ScanNet-scale at fine voxels (the reference's OOM case,
    # run_inference_on_scannet.py:14): > 512M voxels -> block table
    big = [1024, 1024, 640]  # 671M voxels (e.g. 10.2x10.2x6.4 m @ 1 cm)
    t = tables.create_table(8, 64 * 64, n_xyz=big)
    assert isinstance(t, tbb.BlockIndexedTable)
    # creation + insert/lookup actually work at this scale
    keys = jnp.asarray(np.array([[0, 0, 0], [512, 512, 320],
                                 [1023, 1023, 639]], np.int32))
    t, slots, ok = tbb.insert(t, keys, jnp.ones((3,), bool))
    assert np.asarray(ok).all()
    _, found = tbb.lookup(t, keys)
    assert np.asarray(found).all()
    # beyond int32 flat ids -> spatial sharding, not a single-chip table
    with pytest.raises(ValueError, match="spatial"):
        tables.create_table(8, 1024, n_xyz=[2048, 2048, 1024])
    # unbounded scenes (no n_xyz) still get the hash table
    from bnv_fusion_tpu import table as tbh

    assert isinstance(tables.create_table(8, 1024), tbh.SparseVoxelTable)
