"""Dense feature-grid encode/decode + training_global path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import dense_grid, nn as bnn
from bnv_fusion_tpu.config import load_config


def _params():
    return jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))


def test_encode_dense_counts_and_masking(rng):
    params = _params()
    bound_min = jnp.asarray(np.array([-1.0, -1, -1], np.float32))
    bound_max = jnp.asarray(np.array([1.0, 1, 1], np.float32))
    vs = 0.25
    n_xyz = (10, 10, 10)
    # many points in one voxel's neighborhood, one isolated point
    cluster = (rng.rand(60, 3).astype(np.float32) * 0.1 + 0.1)
    lone = np.array([[-0.6, -0.6, -0.6]], np.float32)
    pts = np.concatenate([cluster, lone])
    normals = np.tile(np.array([[0, 0, 1.0]], np.float32), (61, 1))
    feat_grid, cnt_grid = dense_grid.encode_pointcloud_dense(
        params, jnp.asarray(pts), jnp.asarray(normals),
        jnp.ones((61,), bool), bound_min, bound_max, vs, n_xyz,
        min_pts_in_grid=4)
    cnt = np.asarray(cnt_grid)
    fg = np.asarray(feat_grid)
    assert cnt.sum() == 61 * 8
    # cluster voxels have features; the lone point's corners are masked to 0
    lone_corner = tuple(((lone[0] - np.asarray(bound_min)) / vs).astype(int))
    # a single point contributes once to each of its 8 distinct corners
    assert cnt[lone_corner] == 1
    # isolated corners hold < 4 points -> zero features
    assert np.abs(fg[lone_corner]).max() == 0.0
    assert np.abs(fg).max() > 0  # cluster region has features


def test_decode_dense_grid_masked_fallback(rng):
    params = _params()
    n_xyz = (8, 8, 8)
    feat_grid = jnp.zeros(n_xyz + (8,), jnp.float32)
    cnt_grid = jnp.zeros(n_xyz, jnp.float32)
    coords = jnp.asarray(rng.rand(20, 3).astype(np.float32) * 6)
    sdf = dense_grid.decode_dense_grid(params, feat_grid, cnt_grid, coords,
                                       0.1, 4)
    np.testing.assert_allclose(np.asarray(sdf), 0.1, atol=1e-6)


def test_training_global_step_reduces_loss():
    cfg = load_config([
        "model.voxel_size=0.1",
        "model.min_pts_in_grid=4",
        "model.training_global=True",
        "dataset=synthetic_demo",
        "dataset.num_images=4",
        "dataset.img_res=[60,80]",
    ])
    from bnv_fusion_tpu.datasets.synth_scene import SyntheticFusionFramesDataset
    from bnv_fusion_tpu.models.local_point_fusion import FusionPointNetTrainer

    cfg.dataset.n_training_pts = 512
    ds = SyntheticFusionFramesDataset(cfg, "train")
    trainer = FusionPointNetTrainer(cfg)
    losses = []
    for epoch in range(6):
        item = ds[epoch % len(ds)]
        loss, logs = trainer.train_step_global(item, ds.voxel_size, ds.n_xyz)
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_global_feature_decode_shapes(rng):
    params = _params()
    feats = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    q = jnp.asarray(rng.rand(3, 17, 3).astype(np.float32))
    out = dense_grid.global_feature_decode(params, feats, q)
    assert out.shape == (3, 17)
