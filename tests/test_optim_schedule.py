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
