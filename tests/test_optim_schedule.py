"""Loss-plateau early stopping for NeuralMap.optimize (round-4 item 1b).

The reference's iteration count is the fixed n_frames*skip(*2) formula
(reference src/run_e2e.py:284-287); trainer.optim_early_stop treats that
budget as a ceiling and exits once the render loss plateaus.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.pipeline import NeuralMap


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))


def _frame(seed=7, h=48, w=64):
    rng = np.random.RandomState(seed)
    depth = (1.0 + 0.3 * rng.rand(h, w)).astype(np.float32)
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [0, 0, -1.2]
    intr = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                    np.float32)
    return {"depth": depth, "T_wc": T_wc, "intr_mat": intr, "frame_id": 0}


BASE = [
    "model.voxel_size=0.05", "dataset.num_pixels=128",
    "model.train_ray_splits=64", "model.table_capacity=16384",
    "model.min_pts_in_grid=1",
]


def test_early_stop_on_plateau(params):
    """lr=0 freezes the loss; the monitor stops after patience groups (the
    fetch runs one launch late, so the first group is never judged)."""
    cfg = load_config(BASE + ["trainer.optim_early_stop=true",
                              "trainer.optim_es_patience=2"])
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    nm.optimize(64, lr=0.0)
    group = int(cfg.model.optim_iters_per_launch)
    # launch1 pending, launch2 sets best, launches 3-4 go stale -> stop
    assert nm.last_optimize_iters == 4 * group
    assert nm.last_optimize_iters < 64


def test_early_stop_off_runs_full_budget(params):
    cfg = load_config(BASE)
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    nm.optimize(12)
    assert nm.last_optimize_iters == 12


def test_sample_count_override(params):
    """model.ray_tracer.n_fine/n_coarse override the reference's per-ray
    sample formula (fine=2*truncated_units, coarse=5*ray_max_dist) in the
    optimize loop; 0 keeps the formula.  The override must run end-to-end
    through NeuralMap.optimize and actually change the sample tensor."""
    cfg = load_config(BASE + ["model.ray_tracer.n_fine=6",
                              "model.ray_tracer.n_coarse=4"])
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    nm.optimize(8, lr=1e-3)
    assert nm.last_optimize_iters == 8

    # the sampling itself: counts flow through hierarchical_sampling
    from bnv_fusion_tpu import render
    pts, dists = render.hierarchical_sampling(
        jax.random.key(0), 6, 4,
        jnp.ones((5,)), jnp.zeros((5, 3)) + jnp.array([0, 0, 1.0]),
        jnp.tile(jnp.array([[0, 0, 1.0]]), (5, 1)), jnp.zeros((3,)),
        offset_distance=0.25)
    assert pts.shape == (5, 10, 3)


def test_sample_count_override_dp_path(params):
    """The ray-DP sharded optimize step draws jitter at the overridden
    widths and must forward them into prepare_render (regression: a
    mismatched ts width fails shape checking)."""
    cfg = load_config(BASE + ["model.ray_tracer.n_fine=6",
                              "model.ray_tracer.n_coarse=4",
                              "trainer.optimize_devices=2"])
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    nm.optimize(4, lr=1e-3)
    assert nm.last_optimize_iters == 4


def test_lr_scale_equals_baked_lr(params):
    """lr_scale=s on a step built with lr equals a step built with lr*s at
    every iteration (Adam's update direction is lr-independent), so the
    trainer.optim_lr_schedule hook is EXACT, not approximate."""
    from bnv_fusion_tpu import optimize as optmod
    from bnv_fusion_tpu import tsdf

    cfg = load_config(BASE)
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    kwargs = dict(voxel_size=nm.voxel_size,
                  min_pts_in_grid=nm.min_pts_in_grid,
                  truncated_units=nm.truncated_units,
                  truncated_dist=nm.truncated_dist,
                  ray_max_dist=nm.ray_max_dist,
                  n_rays=128, train_ray_splits=64)
    sdf_delta = tsdf.prepare_sdf_delta(nm.tsdf_vol, nm.tsdf_voxel_size,
                                       nm.truncated_dist,
                                       nm.sdf_delta_weight)
    f = nm.frames[0]
    table = nm.table
    # fresh feature/weight buffers per side: the step donates its state and
    # would otherwise delete the table's own buffers between the two runs
    o1, step1, _ = optmod.make_optimize_step(params, lr=1e-3, **kwargs)
    o2, step2, _ = optmod.make_optimize_step(params, lr=5e-4, **kwargs)
    s1 = optmod.init_optim_state(
        o1, table.replace(features=table.features.copy(),
                          weights=table.weights.copy()))
    s2 = optmod.init_optim_state(
        o2, table.replace(features=table.features.copy(),
                          weights=table.weights.copy()))
    for i in range(3):
        k = jax.random.fold_in(jax.random.key(3), i)
        s1, _ = step1(s1, table, f["depth"], f["T_wc"], f["intr"],
                      nm.bound_min, nm.n_xyz, sdf_delta, k,
                      lr_scale=jnp.float32(0.5))
        s2, _ = step2(s2, table, f["depth"], f["T_wc"], f["intr"],
                      nm.bound_min, nm.n_xyz, sdf_delta, k)
    np.testing.assert_array_equal(np.asarray(s1.features),
                                  np.asarray(s2.features))


def test_lr_schedule_scales():
    """_optim_lr_scales: const = exact ones; cosine/linear start at 1.0,
    end at end_frac, decrease monotonically; unknown name raises."""
    cfg = load_config(BASE)
    nm = object.__new__(NeuralMap)  # only .config is read
    nm.config = cfg
    assert np.array_equal(nm._optim_lr_scales(5), np.ones(5, np.float32))

    cfg2 = load_config(BASE + ["trainer.optim_lr_schedule=cosine",
                               "trainer.optim_lr_end_frac=0.2"])
    nm.config = cfg2
    s = nm._optim_lr_scales(9)
    assert s[0] == pytest.approx(1.0) and s[-1] == pytest.approx(0.2)
    assert np.all(np.diff(s) < 0)

    cfg3 = load_config(BASE + ["trainer.optim_lr_schedule=linear",
                               "trainer.optim_lr_end_frac=0.5"])
    nm.config = cfg3
    s = nm._optim_lr_scales(5)
    np.testing.assert_allclose(s, [1.0, 0.875, 0.75, 0.625, 0.5], rtol=1e-6)

    nm.config = load_config(BASE + ["trainer.optim_lr_schedule=nope"])
    with pytest.raises(ValueError):
        nm._optim_lr_scales(4)


def test_lr_schedule_through_pipeline(params):
    """Cosine schedule end-to-end through NeuralMap.optimize, covering both
    the grouped multi-launch path and the remainder single-step path
    (6 iters at group 4 = one multi(4) + two singles)."""
    cfg = load_config(BASE + ["trainer.optim_lr_schedule=cosine"])
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    nm.optimize(6, lr=1e-3)
    assert nm.last_optimize_iters == 6
    assert np.all(np.isfinite(np.asarray(nm.table.features)))


def test_lr_schedule_dp_path(params):
    """The ray-DP sharded step takes the same lr_scale hook."""
    cfg = load_config(BASE + ["trainer.optim_lr_schedule=cosine",
                              "trainer.optimize_devices=2"])
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    nm.optimize(4, lr=1e-3)
    assert nm.last_optimize_iters == 4
    assert np.all(np.isfinite(np.asarray(nm.table.features)))


def test_early_stop_keeps_improving_runs_on(params):
    """With a real lr the loss falls early on — the monitor must not stop
    while improvement continues (relative threshold 0.5% default)."""
    cfg = load_config(BASE + ["trainer.optim_early_stop=true",
                              "trainer.optim_es_patience=3"])
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    nm.integrate(_frame())
    nm.optimize(24, lr=1e-2)
    # improvement in the first launches keeps it alive past the minimum
    # possible stop point (1 pending + 1 best + 3 stale = 5 groups)
    assert nm.last_optimize_iters >= 20
