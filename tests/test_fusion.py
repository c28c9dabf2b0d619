"""Local fusion step vs a direct numpy transliteration of the reference
semantics (encode_pointcloud + _integrate,
reference src/models/fusion/local_point_fusion.py:81-151,647-673)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import fusion, nn as bnn, table as tbl, voxel


def _numpy_oracle_fuse(params, pts, normals, bound_min, bound_max, vs,
                       min_pts, store):
    """Dict-based reference semantics (the reference's unique+scatter+hashmap)."""
    def np_encoder(x):
        h = x
        for i in range(3):
            h = np.maximum(h @ np.asarray(params["encoder"][f"w{i}"]) +
                           np.asarray(params["encoder"][f"b{i}"]), 0)
        return h @ np.asarray(params["encoder"]["w_out"]) + \
            np.asarray(params["encoder"]["b_out"])

    inside = np.all((pts > bound_min + vs) & (pts < bound_max - vs), axis=-1)
    pts, normals = pts[inside], normals[inside]
    coords = (pts - bound_min) / vs
    f, c = np.floor(coords), np.ceil(coords)
    pattern = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]])
    corners = np.where(pattern[None, :, :].astype(bool),
                       c[:, None, :], f[:, None, :]).astype(np.int64)
    rel = coords[:, None, :] - corners
    pn_in = np.concatenate(
        [rel, np.repeat(normals[:, None, :], 8, axis=1)], -1).reshape(-1, 6)
    feats = np_encoder(pn_in.astype(np.float32))

    groups = {}
    for k, ft in zip(map(tuple, corners.reshape(-1, 3)), feats):
        groups.setdefault(k, []).append(ft)
    for k, fl in groups.items():
        cnt = len(fl)
        if cnt < min_pts:
            continue
        mean = np.mean(fl, axis=0)
        new_w = min(cnt / 32.0, 1.0)
        old_f, old_w = store.get(k, (np.zeros_like(mean), 0.0))
        upd_w = old_w + new_w
        store[k] = ((old_f * old_w + mean * new_w) / upd_w, upd_w)
    return store


def _make_setup(rng, n=500):
    params = jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))
    bound_min = np.array([-1.0, -1.0, -1.0], np.float32)
    bound_max = np.array([1.0, 1.0, 1.0], np.float32)
    vs = 0.1
    pts = (rng.rand(n, 3).astype(np.float32) * 1.2 - 0.6)
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return params, bound_min, bound_max, vs, pts, normals


def test_fuse_frame_matches_numpy_oracle(rng):
    params, bound_min, bound_max, vs, pts, normals = _make_setup(rng)
    min_pts = 2
    t = tbl.create_table(4096, 8)
    store = {}
    for frame in range(2):
        fpts = pts + frame * 0.01
        t, stats = fusion.fuse_frame(
            t, params, jnp.asarray(fpts), jnp.asarray(normals),
            jnp.ones((len(fpts),), bool), jnp.asarray(bound_min),
            jnp.asarray(bound_max), vs, min_pts)
        store = _numpy_oracle_fuse(params, fpts, normals, bound_min,
                                   bound_max, vs, min_pts, store)

    keys = np.array(sorted(store.keys()))
    slots, found = tbl.lookup(t, jnp.asarray(keys, jnp.int32))
    assert np.asarray(found).all()
    got_f = np.asarray(t.features)[np.asarray(slots)]
    got_w = np.asarray(t.weights)[np.asarray(slots)]
    exp_f = np.stack([store[tuple(k)][0] for k in keys])
    exp_w = np.array([store[tuple(k)][1] for k in keys])
    np.testing.assert_allclose(got_w, exp_w, atol=1e-5)
    np.testing.assert_allclose(got_f, exp_f, atol=1e-4, rtol=1e-4)


def _check_vs_oracle(t, store, atol_f=1e-4):
    keys = np.array(sorted(store.keys()))
    from bnv_fusion_tpu import tables
    slots, found = tables.lookup(t, jnp.asarray(keys, jnp.int32))
    assert np.asarray(found).all()
    got_f = np.asarray(t.features)[np.asarray(slots)]
    got_w = np.asarray(t.weights)[np.asarray(slots)]
    exp_f = np.stack([store[tuple(k)][0] for k in keys])
    exp_w = np.array([store[tuple(k)][1] for k in keys])
    np.testing.assert_allclose(got_w, exp_w, atol=1e-5)
    np.testing.assert_allclose(got_f, exp_f, atol=atol_f, rtol=1e-4)
    # no other voxel may carry weight
    assert int((np.asarray(t.weights) > 0).sum()) == len(keys)


@pytest.mark.parametrize("algorithm", ["cell", "corner"])
def test_sorted_fuse_paths_match_numpy_oracle(rng, algorithm):
    """Both slot-map sort-reduce paths reproduce the reference update."""
    from bnv_fusion_tpu import table_dense as tbd

    params, bound_min, bound_max, vs, pts, normals = _make_setup(rng)
    min_pts = 2
    t = tbd.create_dense_table([24, 24, 24], 4096, 8)
    store = {}
    for frame in range(2):
        fpts = pts + frame * 0.01
        t, stats = fusion.fuse_frame(
            t, params, jnp.asarray(fpts), jnp.asarray(normals),
            jnp.ones((len(fpts),), bool), jnp.asarray(bound_min),
            jnp.asarray(bound_max), vs, min_pts, max_unique=4096,
            algorithm=algorithm)
        store = _numpy_oracle_fuse(params, fpts, normals, bound_min,
                                   bound_max, vs, min_pts, store)
    assert int(np.asarray(t.overflow)) == 0
    _check_vs_oracle(t, store)


@pytest.mark.parametrize("algorithm", ["cell", "corner"])
def test_sorted_fuse_degenerate_integer_coords(rng, algorithm):
    """Points landing EXACTLY on grid planes collapse floor/ceil corners
    (voxel.corner_neighbors uses ceil, not floor+1); the cell-keyed path
    must reproduce the duplicate-corner accumulation exactly."""
    from bnv_fusion_tpu import table_dense as tbd

    params, bound_min, bound_max, vs, _, _ = _make_setup(rng)
    # mix: exact corners, exact planes (1 or 2 integer axes), generic points
    base = bound_min + vs * np.array([
        [5.0, 5.0, 5.0],      # all-integer coords: 8 corners collapse to 1
        [5.0, 5.0, 5.3],      # two integer axes: collapse to 2
        [5.0, 5.6, 5.3],      # one integer axis: collapse to 4
        [5.2, 5.6, 5.3],      # generic
        [5.2, 5.6, 5.3],      # duplicate point (count accumulation)
        [6.0, 5.0, 5.0],
    ], np.float32)
    pts = np.repeat(base, 4, axis=0)  # enough points to clear min_pts
    normals = rng.randn(len(pts), 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    t = tbd.create_dense_table([24, 24, 24], 4096, 8)
    t, _ = fusion.fuse_frame(
        t, params, jnp.asarray(pts), jnp.asarray(normals),
        jnp.ones((len(pts),), bool), jnp.asarray(bound_min),
        jnp.asarray(bound_max), vs, 2, max_unique=512, algorithm=algorithm)
    store = _numpy_oracle_fuse(params, pts, normals, bound_min,
                               bound_max, vs, 2, {})
    _check_vs_oracle(t, store)


def test_fuse_frame_below_min_pts_stays_zero(rng):
    params, bound_min, bound_max, vs, pts, normals = _make_setup(rng, n=64)
    t = tbl.create_table(4096, 8)
    t, _ = fusion.fuse_frame(
        t, params, jnp.asarray(pts), jnp.asarray(normals),
        jnp.ones((len(pts),), bool), jnp.asarray(bound_min),
        jnp.asarray(bound_max), vs, min_pts_in_grid=1000)
    # nothing reaches 1000 pts per voxel -> no weights anywhere
    assert float(jnp.max(t.weights)) == 0.0
    assert float(jnp.max(jnp.abs(t.features))) == 0.0


def test_fuse_frame_jit_fixed_shapes(rng):
    params, bound_min, bound_max, vs, pts, normals = _make_setup(rng, n=128)
    step = fusion.make_fuse_frame_fn(vs, 2, donate=False)
    t = tbl.create_table(2048, 8)
    t, stats = step(t, params, jnp.asarray(pts), jnp.asarray(normals),
                    jnp.ones((len(pts),), bool), jnp.asarray(bound_min),
                    jnp.asarray(bound_max))
    assert float(stats.n_valid_pts) > 0
    assert float(stats.n_touched) > 0


def test_decode_points_masked_returns_voxel_size(rng):
    params = jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(1)))
    t = tbl.create_table(512, 8)
    vs = 0.1
    sdf = fusion.decode_points(
        t.features, t, params, jnp.asarray(np.zeros((5, 3), np.float32)),
        jnp.asarray(np.array([-1, -1, -1], np.float32)), vs, 8)
    np.testing.assert_allclose(np.asarray(sdf), vs, atol=1e-6)


def test_decode_points_uses_latents_when_unmasked(rng):
    params = jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(2)))
    vs = 0.1
    bound_min = jnp.asarray(np.array([-1, -1, -1], np.float32))
    t = tbl.create_table(512, 8)
    # activate the 8 corners around coords (10.5, 10.5, 10.5) with weight 8
    base = np.array([10, 10, 10], np.int32)
    corners = base + np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                               for z in (0, 1)], np.int32)
    t, slots, _ = tbl.insert(t, jnp.asarray(corners),
                             jnp.ones((8,), bool))
    feats = rng.randn(8, 8).astype(np.float32)
    t = t.replace(features=t.features.at[slots].set(jnp.asarray(feats)),
                  weights=t.weights.at[slots].set(8.0))
    pts = bound_min + jnp.asarray((base + 0.5) * vs)[None, :]
    sdf = fusion.decode_points(t.features, t, params, pts, bound_min, vs, 8)
    # must differ from the masked fallback and equal the direct blend
    assert abs(float(sdf[0]) - vs) > 1e-6

    coords = (np.asarray(pts) - np.asarray(bound_min)) / vs
    local = coords[:, None, :] - corners[None, :, :].astype(np.float32)
    # corner order in decode is reference corner order; compute blend directly
    c_jax = voxel.corner_neighbors(jnp.asarray(coords))
    tw = voxel.trilinear_weights(jnp.asarray(coords), c_jax)
    lo = voxel.local_offsets(jnp.asarray(coords), c_jax)
    s2, f2 = tbl.lookup(t, c_jax.reshape(-1, 3))
    fz = np.asarray(t.features)[np.asarray(s2)].reshape(1, 8, 8)
    alpha = np.asarray(bnn.decoder_apply(params, lo, jnp.asarray(fz)))[..., 0]
    expect = (alpha * np.asarray(tw)).sum(-1) * vs
    np.testing.assert_allclose(np.asarray(sdf), expect, atol=1e-5)


def test_bump_optim_weights_once_per_touch(rng):
    t = tbl.create_table(256, 2)
    coords = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    t, slots, _ = tbl.insert(t, jnp.asarray(coords), jnp.ones((2,), bool))
    # touch voxel 0 five times, voxel 1 once; absent voxel ignored
    touched = np.array([[1, 2, 3]] * 5 + [[4, 5, 6]] + [[9, 9, 9]], np.int32)
    t2 = fusion.bump_optim_weights(t, jnp.asarray(touched))
    w = np.asarray(t2.weights)[np.asarray(slots)]
    np.testing.assert_allclose(w, [1.0, 1.0])


def test_bump_optim_weights_slot_reuse_exact(rng):
    """Passing decode_prepare's (slots, found) must equal the internal
    lookup (the optimize loop reuses prep's lookup; round-5 probe)."""
    t = tbl.create_table(256, 2)
    coords = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    t, _, _ = tbl.insert(t, jnp.asarray(coords), jnp.ones((2,), bool))
    touched = jnp.asarray(np.array([[1, 2, 3]] * 3 + [[9, 9, 9]], np.int32))
    slots, found = tbl.lookup(t, touched)
    a = fusion.bump_optim_weights(t, touched)
    b = fusion.bump_optim_weights(t, touched, slots=slots, found=found)
    np.testing.assert_array_equal(np.asarray(a.weights),
                                  np.asarray(b.weights))


class TestScatterAddRows:
    """scatter_add_rows: the sort-reduced cotangent accumulation must match
    the plain scatter-add (up to float reassociation) including dropped
    sentinel rows, and the lax.cond fallback must keep exactness when the
    unique count exceeds the compaction budget."""

    def _both(self, gidx, rows, cap, **kw):
        a = fusion.scatter_add_rows(jnp.asarray(gidx), jnp.asarray(rows),
                                    cap, method="scatter")
        b = fusion.scatter_add_rows(jnp.asarray(gidx), jnp.asarray(rows),
                                    cap, method="sortreduce", **kw)
        return np.asarray(a), np.asarray(b)

    def test_matches_plain_scatter(self, rng):
        cap, n, f = 512, 4096, 8
        gidx = rng.randint(0, 40, size=n).astype(np.int32)  # heavy dups
        gidx[rng.rand(n) < 0.1] = cap                       # dropped rows
        rows = rng.randn(n, f).astype(np.float32)
        a, b = self._both(gidx, rows, cap)
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)

    def test_budget_overflow_falls_back_exactly(self, rng):
        cap, n, f = 8192, 1024, 4
        gidx = rng.permutation(cap)[:n].astype(np.int32)    # ALL unique
        rows = rng.randn(n, f).astype(np.float32)
        # budget 64 << 1024 uniques -> the cond must take the plain path
        a, b = self._both(gidx, rows, cap, unique_budget=64)
        np.testing.assert_array_equal(a, b)

    def test_all_dropped(self):
        cap, n, f = 64, 128, 3
        gidx = np.full(n, cap, np.int32)
        rows = np.ones((n, f), np.float32)
        a, b = self._both(gidx, rows, cap)
        assert np.all(a == 0) and np.all(b == 0)
