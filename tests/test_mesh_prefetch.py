"""Optimize-overlapped mesh-lattice prefetch (round-4 e2e wall attack).

NeuralMap.optimize starts a background build of the sample lattice over ALL
allocated voxels (keys are immutable during optimize); extract_mesh filters
the lattice's cells to the exact post-optimize gate via per-cell ownership
(mesh.cell_owner_voxel).  The mesh must be identical to the in-line build.
"""

import numpy as np
import pytest

from bnv_fusion_tpu import mesh as mesh_mod
from bnv_fusion_tpu.checkpoint import load_pretrained
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.datasets import get_dataset


BASE = [
    "model.voxel_size=0.04",
    "dataset.num_images=6",
    "dataset.img_res=[120,160]",
    "dataset.num_pixels=256",
    "model.train_ray_splits=128",
    "model.table_capacity=65536",
    "model.min_pts_in_grid=2",
]


def test_cell_owner_voxel_roundtrip():
    """Every cell of a built lattice maps back to a generating voxel."""
    rng = np.random.RandomState(0)
    coords = np.unique(rng.randint(0, 12, size=(64, 3)).astype(np.int32),
                       axis=0)
    for scale in (2, 4):
        _, _, cells = mesh_mod.build_sample_lattice(coords, scale)
        owners = mesh_mod.cell_owner_voxel(cells, scale)
        have = {tuple(c) for c in coords}
        assert all(tuple(o) in have for o in owners)
        # ownership partitions the cells: each voxel owns exactly scale^3
        uniq, counts = np.unique(owners, axis=0, return_counts=True)
        assert len(uniq) == len(coords)
        assert (counts == scale ** 3).all()


@pytest.mark.parametrize("use_delta", [True, False])
def test_prefetched_mesh_identical(pretrained_tcnn_path, use_delta):
    """fuse -> optimize -> extract_mesh with the prefetch on and off: the
    meshes are identical (same cells, same corner positions, decode is
    row-independent)."""
    from bnv_fusion_tpu.pipeline import NeuralMap

    params = load_pretrained(pretrained_tcnn_path)
    meshes = {}
    for mode in ("prefetch", "inline"):
        extra = [] if mode == "prefetch" else ["model.mesh_prefetch=false"]
        cfg = load_config(BASE + extra)
        ds = get_dataset(cfg, "val")
        nm = NeuralMap(ds.dimensions, cfg, params)
        for i in range(len(ds)):
            nm.integrate(ds[i])
        nm.optimize(4)
        if mode == "prefetch":
            assert nm._prefetched_lattice() is not None
        m = nm.extract_mesh(use_delta=use_delta)
        assert m is not None and len(m.vertices) > 0
        meshes[mode] = m

    m1, m2 = meshes["prefetch"], meshes["inline"]
    assert m1.vertices.shape == m2.vertices.shape
    np.testing.assert_allclose(m1.vertices, m2.vertices, atol=1e-6)
    np.testing.assert_array_equal(m1.faces, m2.faces)


def test_prefetch_invalidated_by_new_frames(pretrained_tcnn_path):
    """Integrating after optimize invalidates the prefetch (epoch token);
    extract_mesh falls back to the in-line build and stays correct."""
    from bnv_fusion_tpu.pipeline import NeuralMap

    params = load_pretrained(pretrained_tcnn_path)
    cfg = load_config(BASE)
    ds = get_dataset(cfg, "val")
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(len(ds) - 1):
        nm.integrate(ds[i])
    nm.optimize(4)
    assert nm._prefetched_lattice() is not None
    nm.integrate(ds[len(ds) - 1])        # bumps the fuse epoch
    assert nm._prefetched_lattice() is None
    m = nm.extract_mesh(use_delta=True)
    assert m is not None and len(m.vertices) > 0
