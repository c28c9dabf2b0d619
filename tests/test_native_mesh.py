"""Native C++ marching tetrahedra vs the numpy reference implementation."""

import numpy as np
import pytest

from bnv_fusion_tpu import mesh as m
from bnv_fusion_tpu import native


def _sphere_cells(radius=5.0, extent=8):
    rng = np.arange(-extent, extent)
    origins = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                       axis=-1).reshape(-1, 3)
    corners = origins[:, None, :] + m._CUBE_CORNERS[None, :, :]
    sdf = (np.linalg.norm(corners, axis=-1) - radius).astype(np.float32)
    return origins, sdf


@pytest.fixture(scope="module")
def native_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_matches_numpy_triangles(native_ok):
    origins, sdf = _sphere_cells()
    ref = m.marching_tetrahedra(origins, sdf)
    verts, faces = native.marching_tetrahedra_native(origins, sdf, 0.0)
    # unwelded native output: identical triangle soup (same order)
    np.testing.assert_allclose(
        verts[faces].reshape(-1, 9),
        ref.vertices[ref.faces].reshape(-1, 9), atol=1e-5)


def test_native_weld_reduces_vertices(native_ok):
    origins, sdf = _sphere_cells()
    v0, f0 = native.marching_tetrahedra_native(origins, sdf, 0.0)
    v1, f1 = native.marching_tetrahedra_native(origins, sdf, 1e-3)
    assert len(v1) < len(v0)
    # welded mesh keeps the geometry (same radius stats)
    r = np.linalg.norm(v1, axis=-1)
    assert abs(r.mean() - 5.0) < 0.05


def test_native_orientation_outward(native_ok):
    origins, sdf = _sphere_cells()
    v, f = native.marching_tetrahedra_native(origins, sdf, 1e-3)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(b - a, c - a)
    centroid = (a + b + c) / 3
    nondeg = np.linalg.norm(n, axis=-1) > 1e-9
    assert ((n * centroid).sum(-1)[nondeg] > 0).all()


def test_extract_mesh_native_path():
    vs = 0.05
    min_coords = np.array([-1.0, -1.0, -1.0], np.float32)
    rng = np.arange(0, 40)
    g = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    world = g * vs + min_coords
    d = np.abs(np.linalg.norm(world, axis=-1) - 0.5)
    active = g[d < 2 * vs].astype(np.int32)

    import jax.numpy as jnp

    def decode_fn(coords):
        w = np.asarray(coords) * vs + min_coords
        return jnp.asarray(np.linalg.norm(w, axis=-1) - 0.5)

    out_native = m.extract_mesh(decode_fn, active, min_coords, vs,
                                batch_size=8192, use_native=True)
    out_numpy = m.extract_mesh(decode_fn, active, min_coords, vs,
                               batch_size=8192, use_native=False)
    for out in (out_native, out_numpy):
        r = np.linalg.norm(out.vertices, axis=-1)
        assert abs(r.mean() - 0.5) < 0.005


def test_build_sample_lattice_native_parity():
    """C++ lattice builder is bit-identical to the numpy path (points,
    corner indices and cells, incl. negative coords and scale 4)."""
    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(3)
    coords = np.unique(rng.randint(-40, 40, size=(4000, 3)), axis=0)
    for scale in (2, 4):
        p_np, ci_np, c_np = m.build_sample_lattice(coords, scale,
                                                   use_native=False)
        p_nt, ci_nt, c_nt = m.build_sample_lattice(coords, scale,
                                                   use_native=True)
        assert np.array_equal(p_np, p_nt)
        assert np.array_equal(ci_np, ci_nt)
        assert np.array_equal(c_np, c_nt)


def test_native_weld_packed_vs_unpacked(native_ok):
    """The packed single-int64 weld table (origins within the 21-bit biased
    range) and the generic 3-key fallback (forced by a huge coordinate
    offset) produce identical topology: same counts, and translating the
    packed result by the offset reproduces the unpacked vertices."""
    origins, sdf = _sphere_cells()
    off = 1 << 21                       # beyond the packed-key precheck
    v_small, f_small = native.marching_tetrahedra_native(origins, sdf, 0.5)
    v_big, f_big = native.marching_tetrahedra_native(origins + off, sdf, 0.5)
    assert v_small.shape == v_big.shape
    assert np.array_equal(f_small, f_big)
    np.testing.assert_allclose(v_small + off, v_big, rtol=1e-6)


def test_native_weld_matches_reference_merge(native_ok):
    """In-pass weld at tol == the numpy pipeline's merge tolerance yields
    the same vertex set as numpy marching_tetrahedra + merge_vertices."""
    origins, sdf = _sphere_cells()
    tol = 0.5
    v_nat, f_nat = native.marching_tetrahedra_native(origins, sdf, tol)
    ref = m.marching_tetrahedra(origins, sdf)
    merged = m.merge_vertices(m.Mesh(ref.vertices, ref.faces), tol)
    assert len(v_nat) == len(merged.vertices)
    # same welded vertex positions as sets (round to kill fp noise)
    a = {tuple(np.round(v, 4)) for v in v_nat}
    b = {tuple(np.round(v, 4)) for v in merged.vertices}
    assert a == b


def test_native_indexed_matches_plain(native_ok):
    """Fused indexed MC (gather + crossing gate in C++) is bit-identical to
    gathering/compacting in numpy and calling the plain native MC — with and
    without the NaN observation-sentinel semantics."""
    rng = np.random.RandomState(7)
    ext = 8
    r = np.arange(-ext, ext)
    cells = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    # point lattice covering the cells, sdf sampled per point (shared corners)
    pr = np.arange(-ext, ext + 1)
    pts = np.stack(np.meshgrid(pr, pr, pr, indexing="ij"), -1).reshape(-1, 3)
    sdf = (np.linalg.norm(pts, axis=-1) - 5.0).astype(np.float32)
    # NaN-out a random 20% of points (unobserved)
    nanmask = rng.rand(len(sdf)) < 0.2
    sdf_nan = sdf.copy()
    sdf_nan[nanmask] = np.nan
    # corner index via the lattice key order
    side = 2 * ext + 1
    def pid(c):
        return ((c[..., 0] + ext) * side + (c[..., 1] + ext)) * side + (
            c[..., 2] + ext)
    corner_idx = pid(cells[:, None, :] + m._CUBE_CORNERS[None]).astype(np.int64)
    fallback = np.float32(0.05)

    for sentinel, s in ((False, sdf), (True, sdf_nan)):
        cell_sdf = s[corner_idx]
        if sentinel:
            observed = ~np.isnan(cell_sdf)
            obs_min = np.where(observed, cell_sdf, np.inf).min(1)
            obs_max = np.where(observed, cell_sdf, -np.inf).max(1)
            crossing = (obs_min < 0) & (obs_max > 0)
            cell_sdf = np.where(observed, cell_sdf, fallback)
        else:
            crossing = (cell_sdf.min(1) < 0) & (cell_sdf.max(1) > 0)
        for tol in (0.0, 0.5):
            v_ref, f_ref = native.marching_tetrahedra_native(
                cells[crossing], cell_sdf[crossing], tol)
            v_idx, f_idx = native.marching_tetrahedra_indexed_native(
                cells, corner_idx, s, use_sentinel=sentinel,
                nan_fallback=fallback, weld_tol=tol)
            assert np.array_equal(v_ref, v_idx), (sentinel, tol)
            assert np.array_equal(f_ref, f_idx), (sentinel, tol)
        assert crossing.sum() > 100  # the fixture actually exercises the gate


def test_native_indexed_face_cells(native_ok):
    """Per-face source-cell ids from the indexed native MC group the same
    triangles to the same cells as the numpy return_cell_ids path (the
    incremental mesher keys its triangle cache by these)."""
    rng = np.arange(-6, 6)
    cells = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                     -1).reshape(-1, 3)
    pr = np.arange(-6, 7)
    pts = np.stack(np.meshgrid(pr, pr, pr, indexing="ij"), -1).reshape(-1, 3)
    sdf = (np.linalg.norm(pts, axis=-1) - 4.0).astype(np.float32)
    side = 13

    def pid(c):
        return ((c[..., 0] + 6) * side + (c[..., 1] + 6)) * side + (
            c[..., 2] + 6)

    corner_idx = pid(cells[:, None, :] + m._CUBE_CORNERS[None]).astype(np.int64)
    v, f, fc = native.marching_tetrahedra_indexed_native(
        cells, corner_idx, sdf, use_sentinel=False, nan_fallback=0.0,
        weld_tol=0.0, return_cell_ids=True)
    assert len(fc) == len(f)

    cell_sdf = sdf[corner_idx]
    crossing = (cell_sdf.min(1) < 0) & (cell_sdf.max(1) > 0)
    ref, tri_cell = m.marching_tetrahedra(cells[crossing], cell_sdf[crossing],
                                          return_cell_ids=True)
    # same per-face source cells (native ids index ALL cells, numpy ids the
    # crossing-compacted subset) and same triangle soup order
    assert np.array_equal(cells[fc], cells[crossing][tri_cell])
    assert np.allclose(ref.vertices[ref.faces], v[f])
    # every face's triangle lies inside its cell's unit cube
    tri = v[f]
    lo = cells[fc][:, None, :].astype(np.float32)
    assert (tri >= lo - 1e-5).all() and (tri <= lo + 1 + 1e-5).all()
