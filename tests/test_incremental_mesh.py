"""Incremental mesher: cached extraction equals full re-extraction."""

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import mesh as m
from bnv_fusion_tpu.incremental_mesh import IncrementalMesher


def _setup(radius):
    vs = 0.05
    min_coords = np.array([-1.0, -1.0, -1.0], np.float32)
    rng = np.arange(0, 40)
    g = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    world = g * vs + min_coords
    d = np.abs(np.linalg.norm(world, axis=-1) - radius)
    active = g[d < 2 * vs].astype(np.int32)

    def decode_fn(coords):
        w = np.asarray(coords) * vs + min_coords
        return jnp.asarray(np.linalg.norm(w, axis=-1) - radius)

    return vs, min_coords, active, decode_fn


def _sorted_verts(mesh):
    v = np.round(mesh.vertices / 1e-5).astype(np.int64)
    return v[np.lexsort(v.T)]


def test_first_update_matches_full_extraction():
    vs, mn, active, decode_fn = _setup(0.5)
    weights = np.full(len(active), 8.0, np.float32)
    feats = np.zeros((len(active), 4), np.float32)
    inc = IncrementalMesher(mn, vs)
    got = inc.update(decode_fn, active, weights, feats, min_weight=1.0)
    full = m.extract_mesh(decode_fn, active, mn, vs, batch_size=1 << 14,
                          use_native=False)
    # same surface: equal vertex sets after welding
    np.testing.assert_array_equal(_sorted_verts(got), _sorted_verts(full))


def test_incremental_update_tracks_surface_change():
    vs, mn, active, decode_a = _setup(0.5)
    weights = np.full(len(active), 8.0, np.float32)
    feats = np.zeros((len(active), 4), np.float32)
    inc = IncrementalMesher(mn, vs)
    inc.update(decode_a, active, weights, feats, min_weight=1.0)

    # surface moves slightly; only half the voxels report changes
    _, _, active_b, decode_b = _setup(0.52)
    # keep slot order stable: same active set (its shell covers r=0.52 too)
    changed = active[:, 0] >= 20  # "half the scene was refit"
    feats2 = feats.copy()
    feats2[changed, 1] += 1.0
    got = inc.update(decode_b, active, weights, feats2, min_weight=1.0)

    # ground truth: full extraction with a decoder mixing the two radii
    def decode_mixed(coords):
        w = np.asarray(coords) * vs + mn
        r = np.where(w[:, 0] >= (20 * vs + mn[0]) - 2 * vs, 0.52, 0.5)
        return jnp.asarray(np.linalg.norm(w, axis=-1) - r)

    # sanity: updated region uses the new surface
    verts = got.vertices
    right = verts[verts[:, 0] > 0.15]
    r_right = np.linalg.norm(right, axis=-1)
    assert abs(r_right.mean() - 0.52) < 0.01
    # untouched region keeps the old surface
    left = verts[verts[:, 0] < -0.15]
    r_left = np.linalg.norm(left, axis=-1)
    assert abs(r_left.mean() - 0.5) < 0.01


def test_no_change_returns_cached():
    vs, mn, active, decode_fn = _setup(0.5)
    weights = np.full(len(active), 8.0, np.float32)
    feats = np.zeros((len(active), 4), np.float32)
    inc = IncrementalMesher(mn, vs)
    m1 = inc.update(decode_fn, active, weights, feats, min_weight=1.0)
    calls = []

    def counting_decode(coords):
        calls.append(1)
        return decode_fn(coords)

    m2 = inc.update(counting_decode, active, weights, feats, min_weight=1.0)
    assert not calls  # nothing changed -> no decode at all
    np.testing.assert_array_equal(_sorted_verts(m1), _sorted_verts(m2))


def test_feature_change_with_equal_sum_is_detected():
    """A latent change that keeps the feature SUM constant must re-mesh
    (the old sum-proxy change detector aliased here)."""
    vs, mn, active, decode_a = _setup(0.5)
    weights = np.full(len(active), 8.0, np.float32)
    feats = np.zeros((len(active), 4), np.float32)
    inc = IncrementalMesher(mn, vs)
    inc.update(decode_a, active, weights, feats, min_weight=1.0)

    _, _, _, decode_b = _setup(0.52)
    feats2 = feats.copy()
    feats2[:, 0] += 1.0
    feats2[:, 1] -= 1.0  # sum unchanged
    got = inc.update(decode_b, active, weights, feats2, min_weight=1.0)
    r = np.linalg.norm(got.vertices, axis=-1)
    assert abs(r.mean() - 0.52) < 0.01


def test_prior_change_triggers_remesh():
    """Changes arriving ONLY through sdf_delta re-mesh affected voxels."""
    vs, mn, active, decode_a = _setup(0.5)
    n_xyz = np.array([40, 40, 40])
    weights = np.full(len(active), 8.0, np.float32)
    feats = np.zeros((len(active), 4), np.float32)
    inc = IncrementalMesher(mn, vs, n_xyz=n_xyz)
    delta0 = np.zeros((20, 20, 20), np.float32)
    inc.update(decode_a, active, weights, feats, min_weight=1.0,
               sdf_delta=delta0)

    # the decoder now reflects a prior shift, but latents are unchanged;
    # only the prior diff can trigger the re-decode
    _, _, _, decode_b = _setup(0.52)
    delta1 = delta0.copy()
    delta1[:] = 0.1  # global prior move
    got = inc.update(decode_b, active, weights, feats, min_weight=1.0,
                     sdf_delta=delta1)
    r = np.linalg.norm(got.vertices, axis=-1)
    assert abs(r.mean() - 0.52) < 0.01


def test_cached_weld_keys_bit_identical():
    """The per-block weld keys cached at append time must reproduce the
    recompute-at-assemble weld bit-exactly (incl. after a partial update
    that drops + re-appends cache rows)."""
    vs, mn, active, decode_a = _setup(0.5)
    weights = np.full(len(active), 8.0, np.float32)
    feats = np.zeros((len(active), 4), np.float32)
    inc = IncrementalMesher(mn, vs)
    inc.update(decode_a, active, weights, feats, min_weight=1.0)
    _, _, _, decode_b = _setup(0.52)
    feats2 = feats.copy()
    feats2[active[:, 0] >= 20, 1] += 1.0
    got = inc.update(decode_b, active, weights, feats2, min_weight=1.0)

    assert inc._weld_ok
    # cached keys equal a fresh pack over the full cache
    fresh = m.pack_weld_keys(inc._world_verts(inc._tris),
                             vs * inc.merge_tol_factor)
    np.testing.assert_array_equal(inc._tri_weld.reshape(-1), fresh)
    # and the assembled mesh equals the no-cache weld bit-exactly
    verts = inc._world_verts(inc._tris)
    faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    plain = m.merge_vertices(m.Mesh(verts, faces), vs * inc.merge_tol_factor)
    np.testing.assert_array_equal(got.vertices, plain.vertices)
    np.testing.assert_array_equal(got.faces, plain.faces)


def test_weld_out_of_range_falls_back():
    """Coordinates beyond the +-2**20 packing range disable the cached-key
    path but still weld correctly via the row-unique fallback."""
    vs = 1.0  # tol = 0.25 -> round(verts/0.25) exceeds 2**20 at 300k units
    mn = np.array([3.0e5, 0.0, 0.0], np.float32)
    inc = IncrementalMesher(mn, vs)
    tris = np.array([[[0, 0, 0], [2, 0, 0], [0, 2, 0]],
                     [[0, 0, 0], [0, 2, 0], [0, 0, 2]]], np.float32)
    keys = np.zeros(2, np.int64)
    inc._tris = np.zeros((0, 3, 3), np.float32)
    # drive the append path directly
    packed = m.pack_weld_keys(inc._world_verts(tris), vs * 0.25)
    assert packed is None
    inc._tris = tris
    inc._tri_keys = keys
    inc._weld_ok = False
    out = inc._assemble()
    # shared vertices welded: 6 raw verts -> 4 unique
    assert len(out.vertices) == 4
    assert len(out.faces) == 2


def test_prior_unchanged_no_remesh():
    vs, mn, active, decode_fn = _setup(0.5)
    n_xyz = np.array([40, 40, 40])
    weights = np.full(len(active), 8.0, np.float32)
    feats = np.zeros((len(active), 4), np.float32)
    inc = IncrementalMesher(mn, vs, n_xyz=n_xyz)
    delta = np.zeros((20, 20, 20), np.float32)
    inc.update(decode_fn, active, weights, feats, min_weight=1.0,
               sdf_delta=delta)
    calls = []

    def counting_decode(coords):
        calls.append(1)
        return decode_fn(coords)

    inc.update(counting_decode, active, weights, feats, min_weight=1.0,
               sdf_delta=delta.copy())
    assert not calls
