"""Batched (scan) frame integration matches sequential per-frame integrate."""

import numpy as np

from bnv_fusion_tpu.checkpoint import load_pretrained
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.pipeline import NeuralMap
from bnv_fusion_tpu import tables as tbl


def test_integrate_batch_matches_sequential(pretrained_tcnn_path):
    cfg = load_config([
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=6", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ])
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(6)]

    nm_seq = NeuralMap(ds.dimensions, cfg, params)
    for f in frames:
        nm_seq.integrate(f)

    nm_bat = NeuralMap(ds.dimensions, cfg, params)
    nm_bat.integrate_batch(frames[:3])
    nm_bat.integrate_batch(frames[3:])

    k1, f1, w1, _, _ = tbl.active_entries(nm_seq.table)
    k2, f2, w2, _, _ = tbl.active_entries(nm_bat.table)
    o1, o2 = np.lexsort(k1.T), np.lexsort(k2.T)
    np.testing.assert_array_equal(k1[o1], k2[o2])
    np.testing.assert_allclose(w1[o1], w2[o2], atol=1e-5)
    np.testing.assert_allclose(f1[o1], f2[o2], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nm_seq.tsdf_vol.sdf),
                               np.asarray(nm_bat.tsdf_vol.sdf), atol=1e-5)
    assert len(nm_bat.frames) == 6
    assert len(nm_bat.stats) == 6


def test_raw_uint16_depth_staging_matches_f32(pretrained_tcnn_path):
    """Staging sensor-native uint16 depth (device-side conversion) fuses
    identically to host-converted float32 depth."""
    import jax.numpy as jnp

    cfg = load_config([
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=4", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ])
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")
    max_depth = float(cfg.model.ray_tracer.ray_max_dist)

    frames_f32, frames_raw = [], []
    for i in range(4):
        f = ds[i]
        raw = np.round(np.asarray(f["depth"]) * 1000.0).astype(np.uint16)
        metric = raw.astype(np.float32) / 1000.0
        metric = np.where(metric < max_depth, metric, 0.0)
        base = {"T_wc": f["T_wc"], "intr_mat": f["intr_mat"]}
        frames_f32.append(dict(base, depth=metric))
        frames_raw.append(dict(base, depth=metric,
                               depth_raw=raw, depth_scale=1000.0))

    nm_a = NeuralMap(ds.dimensions, cfg, params)
    nm_a.integrate_batch(frames_f32)
    nm_b = NeuralMap(ds.dimensions, cfg, params)
    nm_b.integrate_batch(frames_raw)

    np.testing.assert_array_equal(np.asarray(nm_a.table.weights),
                                  np.asarray(nm_b.table.weights))
    np.testing.assert_array_equal(np.asarray(nm_a.table.features),
                                  np.asarray(nm_b.table.features))
    # the ray pool keeps the converted f32 depth on device
    assert nm_b.frames[0]["depth"].dtype == jnp.float32
