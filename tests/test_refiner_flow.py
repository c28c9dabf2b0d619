"""Offline fuse -> save -> refiner hand-off flow (reference test.py ->
train.py refiner, SURVEY §3.2/§3.3)."""

import os

import numpy as np
import pytest

from bnv_fusion_tpu.checkpoint import load_pretrained
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.models.fusion_refiner import FusionRefiner
from bnv_fusion_tpu.pipeline import NeuralMap


@pytest.fixture(scope="module")
def cfg():
    return load_config([
        "model=fusion_refiner_model",
        "model.voxel_size=0.05",
        "model.min_pts_in_grid=3",
        "model.train_ray_splits=256",
        "model.table_capacity=131072",
        "dataset.num_images=8",
        "dataset.img_res=[120,160]",
        "dataset.num_pixels=512",
        "trainer.max_epochs=1",
    ])


def test_fuse_save_refine_roundtrip(cfg, pretrained_tcnn_path, tmp_path):
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "test")

    # offline fusion (the test.py role)
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(len(ds)):
        nm.integrate(ds[i])
    prefix = str(tmp_path / "scan")
    nm.save(prefix)
    assert os.path.exists(prefix + "_sparse_volume.npz")
    assert os.path.exists(prefix + "_tsdf.npy")

    # refinement (the train.py model=fusion_refiner_model role)
    cfg.model.sparse_volume_path = prefix + "_sparse_volume.npz"
    cfg.model.tsdf_prior_path = prefix + "_tsdf.npy"
    refiner = FusionRefiner(cfg, params)
    mesh = refiner.run(ds, str(tmp_path / "refine"), n_epochs=1,
                       iters_per_epoch=2)
    assert mesh is not None and len(mesh.vertices) > 100
    assert os.path.exists(str(tmp_path / "refine" / "refined_0.ply"))
    assert os.path.exists(str(tmp_path / "refine" / "refined_sparse_volume.npz"))


def test_refiner_resamples_mismatched_tsdf(cfg, pretrained_tcnn_path, tmp_path):
    """A prior saved at a different resolution is trilinearly resampled onto
    the volume grid (reference fusion_refiner.py:105-114, align_corners=True)
    instead of rejected.  A linear ramp resamples to an exact linear ramp."""
    params = load_pretrained(pretrained_tcnn_path)
    from bnv_fusion_tpu.datasets import get_dataset

    ds = get_dataset(cfg, "test")
    src = (np.arange(5, dtype=np.float32)[:, None, None]
           * np.ones((5, 7, 9), np.float32))
    coarse = str(tmp_path / "coarse_tsdf.npy")
    np.save(coarse, src)
    cfg2 = load_config([
        "model=fusion_refiner_model", "model.voxel_size=0.05",
        "model.table_capacity=131072", "dataset.num_images=2",
        "dataset.img_res=[120,160]", "dataset.num_pixels=512",
        "model.train_ray_splits=256",
        f"model.tsdf_prior_path={coarse}",
    ])
    refiner = FusionRefiner(cfg2, params)
    refiner.run(ds, str(tmp_path / "r2"), n_epochs=1, iters_per_epoch=1)
    vol = refiner.nmap.tsdf_vol
    metric = np.asarray(vol.sdf) * (refiner.nmap.tsdf_voxel_size * 5.0)
    dx = metric.shape[0]
    expect = np.arange(dx) * (5 - 1) / (dx - 1)
    np.testing.assert_allclose(metric[:, 1, 1], expect, atol=1e-4)
    assert not np.isnan(metric).any()
