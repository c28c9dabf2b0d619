"""Edge cases for the sort-reduce fusion core: empty frames, degenerate
clusters, lattice-aligned points, compaction overflow."""

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import fusion, nn as bnn, table_dense as tbd


def _params():
    return jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))


# plain numpy (coerced at call time): a module-level jnp.asarray is a
# device op at pytest COLLECTION time, which aborts the whole run when the
# axon plugin registers but its tunnel is unreachable
BMIN = np.array([-1.0, -1, -1], np.float32)
BMAX = np.array([1.0, 1, 1], np.float32)


def _fuse(t, pts, normals, valid, min_pts=1, max_unique=1 << 11):
    return fusion.fuse_frame(
        t, _params(), jnp.asarray(pts.astype(np.float32)),
        jnp.asarray(normals.astype(np.float32)), jnp.asarray(valid),
        BMIN, BMAX, 0.1, min_pts, max_unique=max_unique)


def test_fully_invalid_frame_is_noop():
    t = tbd.create_dense_table([24, 24, 24], 1024, 8)
    pts = np.zeros((64, 3))
    normals = np.tile([[0, 0, 1.0]], (64, 1))
    t2, stats = _fuse(t, pts, normals, np.zeros(64, bool))
    assert int(tbd.occupancy(t2)) == 0
    assert float(stats.n_touched) == 0
    assert np.isfinite(float(stats.n_avg_pts))
    assert float(jnp.abs(t2.features).max()) == 0


def test_out_of_bounds_points_are_dropped():
    t = tbd.create_dense_table([24, 24, 24], 1024, 8)
    pts = np.array([[5.0, 0, 0], [0, -5.0, 0], [0.95, 0.95, 0.95],
                    [0.0, 0.0, 0.0]])
    normals = np.tile([[0, 0, 1.0]], (4, 1))
    # bound mask is strict: only points inside (min+vs, max-vs) survive,
    # so (0.95, 0.95, 0.95) > 0.9 is dropped too — only the origin remains
    t2, stats = _fuse(t, pts, normals, np.ones(4, bool))
    assert float(stats.n_valid_pts) == 1
    assert int(np.asarray(t2.overflow)) == 0


def test_single_cluster_single_voxel_region():
    t = tbd.create_dense_table([24, 24, 24], 1024, 8)
    pts = np.tile([[0.033, 0.033, 0.033]], (100, 1)) \
        + np.random.RandomState(0).randn(100, 3) * 1e-4
    normals = np.tile([[0, 0, 1.0]], (100, 1))
    t2, stats = _fuse(t, pts, normals, np.ones(100, bool))
    # all points share one cell -> exactly its 8 corners touched
    assert float(stats.n_touched) == 8
    assert abs(float(stats.n_avg_pts) - 100.0) < 1e-3


def test_lattice_aligned_points_duplicate_corners():
    t = tbd.create_dense_table([24, 24, 24], 1024, 8)
    # exactly on a voxel corner: floor == ceil -> 8 duplicate corner refs
    pts = np.tile([[0.0, 0.0, 0.0]], (10, 1))
    normals = np.tile([[0, 0, 1.0]], (10, 1))
    t2, stats = _fuse(t, pts, normals, np.ones(10, bool))
    assert float(stats.n_touched) == 1          # one distinct voxel
    assert abs(float(stats.n_avg_pts) - 80.0) < 1e-3  # 10 pts x 8 dup corners


def test_compaction_overflow_counted_and_survivors_correct(rng):
    t = tbd.create_dense_table([40, 40, 40], 1 << 14, 8)
    # many distinct voxels, tiny compaction width
    pts = rng.rand(2048, 3).astype(np.float32) * 1.6 - 0.8
    normals = rng.randn(2048, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    t2, stats = _fuse(t, pts, normals, np.ones(2048, bool),
                      max_unique=256)
    overflow = int(np.asarray(t2.overflow))
    assert overflow > 0
    # the surviving voxels are exactly the first 256 in flat-id order and
    # their values remain finite
    assert int(tbd.occupancy(t2)) <= 256
    assert np.isfinite(np.asarray(t2.features)).all()
    # a second frame with plenty of width picks up remaining voxels
    t3, _ = fusion.fuse_frame(
        t2, _params(), jnp.asarray(pts), jnp.asarray(normals),
        jnp.ones((2048,), bool), BMIN, BMAX, 0.1, 1, max_unique=1 << 13)
    assert int(tbd.occupancy(t3)) > int(tbd.occupancy(t2))


def test_nan_depth_points_masked():
    """NaN world points must not poison the table when masked invalid."""
    t = tbd.create_dense_table([24, 24, 24], 1024, 8)
    pts = np.array([[np.nan, 0, 0], [0.1, 0.1, 0.1]], np.float32)
    normals = np.tile([[0, 0, 1.0]], (2, 1)).astype(np.float32)
    valid = np.array([False, True])
    t2, stats = _fuse(t, pts, normals, valid)
    assert np.isfinite(np.asarray(t2.features)).all()
    assert float(stats.n_valid_pts) == 1


def test_merged_batch_overflow_paths(pretrained_tcnn_path):
    """Capacity and merge-width overflow in fuse_frames_merged: counted,
    finite, never crashing; surviving voxels keep valid values."""
    import jax
    import jax.numpy as jnp

    from bnv_fusion_tpu import fusion, table_dense as tbd
    from bnv_fusion_tpu.checkpoint import load_pretrained

    params = load_pretrained(pretrained_tcnn_path)
    rng = np.random.RandomState(3)
    k, n = 3, 512
    pts = (rng.rand(k, n, 3).astype(np.float32) * 1.2 - 0.6)
    normals = rng.randn(k, n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    bound_min = np.array([-1.0, -1.0, -1.0], np.float32)
    args = (params, jnp.asarray(pts), jnp.asarray(normals),
            jnp.ones((k, n), bool), jnp.asarray(bound_min),
            jnp.asarray(-bound_min), 0.05, 1)

    # capacity overflow: far fewer slots than touched voxels
    t_small = tbd.create_dense_table([42, 42, 42], 256, 8)
    t_small, stats = fusion.fuse_frames_merged(t_small, *args,
                                               max_unique=8192)
    assert int(np.asarray(t_small.n_alloc)) <= 256
    assert int(np.asarray(t_small.overflow)) > 0
    assert np.isfinite(np.asarray(t_small.features)).all()
    assert np.isfinite(np.asarray(t_small.weights)).all()
    w = np.asarray(t_small.weights)
    assert (w >= 0).all() and w.max() > 0

    # merge-width overflow: tiny max_unique_batch truncates the merge
    t_nar = tbd.create_dense_table([42, 42, 42], 1 << 15, 8)
    t_nar, _ = fusion.fuse_frames_merged(t_nar, *args, max_unique=8192,
                                         max_unique_batch=512)
    assert int(np.asarray(t_nar.overflow)) > 0
    assert np.isfinite(np.asarray(t_nar.features)).all()

    # roomy widths: zero overflow and parity with the sequential path
    t_ok = tbd.create_dense_table([42, 42, 42], 1 << 15, 8)
    t_ok, _ = fusion.fuse_frames_merged(t_ok, *args, max_unique=8192)
    assert int(np.asarray(t_ok.overflow)) == 0
    t_seq = tbd.create_dense_table([42, 42, 42], 1 << 15, 8)
    for i in range(k):
        t_seq, _ = fusion.fuse_frame(
            t_seq, params, jnp.asarray(pts[i]), jnp.asarray(normals[i]),
            jnp.ones((n,), bool), jnp.asarray(bound_min),
            jnp.asarray(-bound_min), 0.05, 1, max_unique=8192)
    ka, fa, wa, _, _ = tbd.active_entries(t_seq)
    kb, fb, wb, _, _ = tbd.active_entries(t_ok)
    oa, ob = np.lexsort(ka.T), np.lexsort(kb.T)
    np.testing.assert_array_equal(ka[oa], kb[ob])
    np.testing.assert_allclose(wa[oa], wb[ob], atol=1e-5)
    np.testing.assert_allclose(fa[oa], fb[ob], atol=1e-4, rtol=1e-4)
