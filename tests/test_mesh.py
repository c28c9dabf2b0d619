"""Mesh extraction tests: marching tetrahedra on analytic SDFs, PLY IO."""

import numpy as np
import jax.numpy as jnp

from bnv_fusion_tpu import mesh as m


def _sphere_cells(radius=5.0, extent=8):
    rng = np.arange(-extent, extent)
    origins = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                       axis=-1).reshape(-1, 3)
    corners = origins[:, None, :] + m._CUBE_CORNERS[None, :, :]
    sdf = np.linalg.norm(corners, axis=-1) - radius
    return origins, sdf.astype(np.float32)


def test_marching_tetrahedra_sphere_accuracy():
    origins, sdf = _sphere_cells()
    out = m.marching_tetrahedra(origins, sdf)
    assert len(out.vertices) > 100
    r = np.linalg.norm(out.vertices, axis=-1)
    # vertices lie on the lattice-resolution sphere
    assert abs(r.mean() - 5.0) < 0.05
    assert np.abs(r - 5.0).max() < 0.5


def test_marching_tetrahedra_orientation_outward():
    origins, sdf = _sphere_cells()
    out = m.marching_tetrahedra(origins, sdf)
    v, f = out.vertices, out.faces
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(b - a, c - a)
    centroid = (a + b + c) / 3
    dots = (n * centroid).sum(-1)  # outward == along radial direction
    # zero-area slivers (surface through lattice vertices) carry no orientation
    nondegenerate = np.linalg.norm(n, axis=-1) > 1e-9
    assert nondegenerate.sum() > 100
    assert (dots[nondegenerate] > 0).all()


def test_marching_tetrahedra_empty_cases():
    origins = np.array([[0, 0, 0]])
    out = m.marching_tetrahedra(origins, np.ones((1, 8), np.float32))
    assert len(out.vertices) == 0
    out = m.marching_tetrahedra(np.zeros((0, 3), int), np.zeros((0, 8)))
    assert len(out.vertices) == 0


def test_merge_vertices_welds_and_drops_degenerate():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [1e-9, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [0, 0, 1]], np.int32)
    out = m.merge_vertices(m.Mesh(verts, faces), tol=1e-3)
    assert len(out.vertices) == 3
    assert len(out.faces) == 2  # degenerate face dropped, dup face kept twice


def test_build_sample_lattice_dedup():
    coords = np.array([[5, 5, 5], [5, 5, 6]], np.int32)  # adjacent voxels
    points, corner_idx, cells = m.build_sample_lattice(coords)
    # naive would be 2*27 pts; the shared z-plane dedups to 45.  Cells tile
    # contiguously (voxel blocks span [-0.5, +1) half-steps), so 16 distinct.
    assert len(points) == 45
    assert len(cells) == 16
    assert (corner_idx >= 0).all()
    # every cell's corners index points that reproduce origin + offsets
    recon = points[corner_idx[:, 0]]
    np.testing.assert_array_equal(recon, cells)


def test_extract_mesh_analytic_sphere():
    # active voxels = shell around a radius-0.5 sphere, voxel 0.05
    vs = 0.05
    min_coords = np.array([-1.0, -1.0, -1.0], np.float32)
    rng = np.arange(0, 40)
    g = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    world = g * vs + min_coords
    d = np.abs(np.linalg.norm(world, axis=-1) - 0.5)
    active = g[d < 2 * vs].astype(np.int32)

    def decode_fn(coords):
        w = np.asarray(coords) * vs + min_coords
        return jnp.asarray(np.linalg.norm(w, axis=-1) - 0.5)

    out = m.extract_mesh(decode_fn, active, min_coords, vs, batch_size=8192)
    assert out is not None
    r = np.linalg.norm(out.vertices, axis=-1)
    assert abs(r.mean() - 0.5) < 0.005
    assert np.abs(r - 0.5).max() < 0.05


def test_extract_mesh_lattice_scale4_finer_and_accurate():
    # quarter-voxel lattice: same sphere, tighter max error, more vertices
    vs = 0.05
    min_coords = np.array([-1.0, -1.0, -1.0], np.float32)
    rng = np.arange(0, 40)
    g = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    world = g * vs + min_coords
    d = np.abs(np.linalg.norm(world, axis=-1) - 0.5)
    active = g[d < 2 * vs].astype(np.int32)

    def decode_fn(coords):
        w = np.asarray(coords) * vs + min_coords
        return jnp.asarray(np.linalg.norm(w, axis=-1) - 0.5)

    out2 = m.extract_mesh(decode_fn, active, min_coords, vs, batch_size=8192,
                          lattice_scale=2)
    out4 = m.extract_mesh(decode_fn, active, min_coords, vs, batch_size=8192,
                          lattice_scale=4)
    r4 = np.linalg.norm(out4.vertices, axis=-1)
    assert abs(r4.mean() - 0.5) < 0.003
    assert np.abs(r4 - 0.5).max() < np.abs(
        np.linalg.norm(out2.vertices, axis=-1) - 0.5).max()
    assert len(out4.vertices) > 1.3 * len(out2.vertices)


def test_ply_roundtrip(tmp_path):
    verts = np.random.RandomState(0).rand(17, 3).astype(np.float32)
    faces = np.random.RandomState(1).randint(0, 17, (9, 3)).astype(np.int32)
    path = str(tmp_path / "x.ply")
    m.save_ply(path, m.Mesh(verts, faces))
    back = m.load_ply(path)
    np.testing.assert_allclose(back.vertices, verts, atol=1e-7)
    np.testing.assert_array_equal(back.faces, faces)


def test_sample_surface_on_unit_square():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    pts = m.sample_surface(m.Mesh(verts, faces), 5000, seed=0)
    assert pts.shape == (5000, 3)
    assert (pts[:, 2] == 0).all()
    assert 0.4 < pts[:, 0].mean() < 0.6
    assert pts.min() >= 0 and pts.max() <= 1
