"""FusionDataset analog: noisy-depth accumulated-TSDF supervision windows
(reference src/datasets/fusion_dataset.py:61-300) and the world-grid
depth_to_tsdf semantics (src/utils/voxel_utils.py:478-556)."""

import numpy as np
import pytest

from bnv_fusion_tpu import tsdf
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.datasets import get_dataset


def _np_depth_to_tsdf(depth, T_wc, intr, min_coords, res, vs):
    """Numpy transliteration of reference voxel_utils.depth_to_tsdf."""
    h, w = depth.shape
    g = np.stack(np.meshgrid(np.arange(res[0]), np.arange(res[1]),
                             np.arange(res[2]), indexing="ij"), -1)
    world = (g + 0.5) * vs + np.asarray(min_coords)
    T_cw = np.linalg.inv(T_wc)
    cam = world @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = cam[..., 2]
    sz = np.where(np.abs(z) > 1e-8, z, 1e-8)
    px = cam[..., 0] * intr[0, 0] / sz + intr[0, 2]
    py = cam[..., 1] * intr[1, 1] / sz + intr[1, 2]
    ix = np.round(px * (w - 1) / w).astype(np.int64)
    iy = np.round(py * (h - 1) / h).astype(np.int64)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    d = np.where(inside, depth[np.clip(iy, 0, h - 1), np.clip(ix, 0, w - 1)],
                 0.0)
    sdf = np.clip(d - z, -5 * vs, 5 * vs)
    valid = (np.abs(d) > 1e-5) & (z > 0) & (sdf > -2 * vs)
    return np.where(valid, sdf, 0.0), valid.astype(np.float32)


def test_depth_to_tsdf_grid_matches_numpy():
    rng = np.random.RandomState(3)
    h, w = 40, 50
    intr = np.array([[45.0, 0, w / 2], [0, 45.0, h / 2], [0, 0, 1]],
                    np.float32)
    depth = (1.0 + 0.3 * rng.rand(h, w)).astype(np.float32)
    depth[rng.rand(h, w) < 0.1] = 0.0  # holes
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [0.05, -0.03, -0.2]
    res = (20, 18, 22)
    mn = np.array([-0.5, -0.45, 0.2], np.float32)
    vs = 0.05
    s, wt = tsdf.depth_to_tsdf_grid(depth, T_wc, intr, mn, res, vs)
    s_np, w_np = _np_depth_to_tsdf(depth, T_wc, intr, mn, res, vs)
    assert w_np.sum() > 100  # scene actually observed
    np.testing.assert_allclose(np.asarray(wt), w_np, atol=0)
    np.testing.assert_allclose(np.asarray(s), s_np, atol=1e-5)


def test_accumulate_window_mean_and_unobserved():
    h, w = 30, 40
    intr = np.array([[35.0, 0, w / 2], [0, 35.0, h / 2], [0, 0, 1]],
                    np.float32)
    d1 = np.full((h, w), 1.0, np.float32)
    d2 = np.full((h, w), 1.2, np.float32)
    T = np.eye(4, dtype=np.float32)
    res = (16, 16, 16)
    mn = np.array([-0.4, -0.4, 0.3], np.float32)
    vs = 0.05
    sdf, wsum = tsdf.accumulate_tsdf_window(
        [d1, d2], [T, T], [intr, intr], mn, res, vs)
    sdf, wsum = np.asarray(sdf), np.asarray(wsum)
    # never-observed voxels carry +5 voxels (fusion_dataset.py:251)
    assert np.all(sdf[wsum == 0] == pytest.approx(5 * vs))
    # twice-observed voxels average the two per-frame TSDFs
    s1, w1 = _np_depth_to_tsdf(d1, T, intr, mn, res, vs)
    s2, w2 = _np_depth_to_tsdf(d2, T, intr, mn, res, vs)
    both = (w1 > 0) & (w2 > 0)
    assert both.sum() > 50
    np.testing.assert_allclose(sdf[both], (s1 + s2)[both] / 2, atol=1e-5)


def _windows_cfg(num_images=10):
    return load_config([
        "dataset=synthetic_demo",
        "dataset.name=fusion_dataset",
        "dataset.base=synthetic_demo",
        "dataset.img_res=[60,80]",
        f"dataset.num_images={num_images}",
        "dataset.num_pixels=256",
        "dataset.max_neighbor_images=3",
        "model.voxel_size=0.08",
    ])


def test_fusion_windows_item_structure():
    ds = get_dataset(_windows_cfg(), "train")
    frame, rays = ds[4]
    v = 4  # max_neighbor_images + 1
    assert frame["T_wc"].shape == (v, 4, 4)
    assert frame["rgbd"].shape[0:2] == (v, 4)
    assert frame["sdfs"].shape == tuple(frame["world_volume_resolution"])
    assert frame["sdf_weights"].shape == frame["sdfs"].shape
    assert rays["gt_pts"].shape == (v, 256, 3)
    assert rays["uv"].shape == (v, 256, 2)
    # unobserved voxels carry the +5-voxel fill
    unobs = frame["sdf_weights"] == 0
    assert unobs.any()
    np.testing.assert_allclose(frame["sdfs"][unobs], 5 * 0.08, atol=1e-6)
    # observed region has negative (interior) and positive values
    obs = ~unobs
    assert frame["sdfs"][obs].min() < 0 < frame["sdfs"][obs].max()


def test_fusion_windows_noise_only_in_train():
    ds_tr = get_dataset(_windows_cfg(), "train")
    ds_te = get_dataset(_windows_cfg(), "test")
    f_tr, _ = ds_tr[2]
    f_te, _ = ds_te[2]
    # test stage: rgbd depth channel equals the clean depth exactly
    np.testing.assert_allclose(f_te["rgbd"][:, 3], f_te["gt_depth"],
                               atol=0)
    # train stage: noise perturbs observed pixels
    diff = np.abs(f_tr["rgbd"][:, 3] - f_tr["gt_depth"])
    assert diff[f_tr["gt_depth"] > 0].mean() > 1e-4


def test_window_ids_clip_and_stride():
    ds = get_dataset(_windows_cfg(12), "train")
    rng = np.random.RandomState(0)
    ids0 = ds._window_ids(0, rng)
    assert ids0.min() == 0 and ids0.max() <= 11
    ids_end = ds._window_ids(11, np.random.RandomState(1))
    assert ids_end.max() == 11


def test_refiner_prior_from_noisy_depth(tmp_path, pretrained_tcnn_path):
    """End-to-end: refiner builds its prior by accumulating noisy-depth
    TSDFs (the reference training-data path) and still reconstructs."""
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.models.fusion_refiner import FusionRefiner
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        "dataset=synthetic_demo",
        "dataset.img_res=[240,320]",
        "dataset.num_images=8",
        "model.voxel_size=0.04",
        "model.table_capacity=262144",
        "model.min_pts_in_grid=4",
        "model.max_unique_per_frame=65536",
        "model.prior_from_noisy_depth=true",
        "trainer.sampling_size=512",
    ])
    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")

    # fuse a volume first (the refiner's hand-off input)
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(len(ds)):
        nm.integrate(ds[i])
    vol_path = str(tmp_path / "fused_sparse_volume.npz")
    nm.save(str(tmp_path / "fused"))
    cfg.model.sparse_volume_path = vol_path

    ref = FusionRefiner(cfg, params)
    mesh = ref.run(ds, str(tmp_path), n_epochs=1, iters_per_epoch=4)
    assert mesh is not None and len(mesh.vertices) > 0
    # the accumulated prior was installed (weight set to 1 everywhere)
    assert float(np.asarray(ref.nmap.tsdf_vol.weight).min()) == 1.0
