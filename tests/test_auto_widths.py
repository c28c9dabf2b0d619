"""Auto compaction-width sizing + widen-on-overflow (VERDICT round-4 item 2).

model.max_unique_per_frame=auto sizes both sort-reduce widths from a
device-f32 occupancy probe of the first batch (fusion.frame_width_counts —
the same key math as the fuse front, so no f64-probe undercount), and the
pipeline widens + recompiles when the overflow counter still grows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import fusion, geometry, nn as bnn, tables as tbl
from bnv_fusion_tpu import voxel as vx
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.pipeline import NeuralMap


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))


N_XYZ = np.array([40, 40, 40], np.int32)
N_VOX = int(N_XYZ.prod())


def test_frame_width_counts_matches_fuse_and_numpy(params):
    """The probe's corner count equals the fuse path's n_touched stat, and
    its group count equals a brute-force unique over the device keys."""
    rng = np.random.RandomState(11)
    pts = (rng.rand(2048, 3).astype(np.float32) * 1.4 - 0.7)
    normals = rng.randn(2048, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    bound_min = jnp.asarray([-1.0, -1.0, -1.0])
    bound_max = jnp.asarray([1.0, 1.0, 1.0])
    valid = jnp.ones((2048,), bool)
    vs = 0.05

    n_groups, n_corners = fusion.frame_width_counts(
        jnp.asarray(pts), valid, bound_min, bound_max, vs,
        jnp.asarray(N_XYZ), N_VOX)

    t = tbl.create_table(8, 1 << 15, n_xyz=N_XYZ)
    t, stats = fusion.fuse_frame(
        t, params, jnp.asarray(pts), jnp.asarray(normals), valid,
        bound_min, bound_max, vs, 1)
    assert int(np.asarray(t.overflow)) == 0
    assert int(n_corners) == int(np.asarray(stats.n_touched))

    inside, cell, mcode, _ = fusion._cell_keys(
        jnp.asarray(pts), valid, bound_min, bound_max, vs,
        jnp.asarray(N_XYZ), N_VOX)
    m = np.asarray(inside)
    pairs = np.stack([np.asarray(cell)[m], np.asarray(mcode)[m]], -1)
    assert int(n_groups) == len(np.unique(pairs, axis=0))


def _synthetic_frames(n=4, h=48, w=64, seed=3):
    rng = np.random.RandomState(seed)
    frames = []
    for i in range(n):
        depth = (0.8 + 0.5 * rng.rand(h, w)).astype(np.float32)
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, 3] = [0, 0, -1.2 + 0.03 * i]
        intr = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                        np.float32)
        frames.append({"depth": depth, "T_wc": T_wc, "intr_mat": intr,
                       "frame_id": i})
    return frames


def test_auto_widths_match_explicit(params):
    """Zero hand overrides: the probed widths fuse the exact voxel set /
    counts / weights of an explicit wide configuration (width invariance
    holds because overflow stays 0)."""
    base = ["model.voxel_size=0.05", "model.table_capacity=65536",
            "model.min_pts_in_grid=1"]
    frames = _synthetic_frames()
    dims = np.array([2.0, 2.0, 2.0], np.float32)

    tabs = {}
    for mode, extra in (
            ("auto", ["model.max_unique_per_frame=auto"]),
            ("wide", ["model.max_unique_per_frame=32768",
                      "model.max_unique_cells_per_frame=16384"])):
        cfg = load_config(base + extra)
        nm = NeuralMap(dims, cfg, params)
        nm.integrate_batch(frames)
        assert nm.overflow == 0
        if mode == "auto":
            mu, mu_cells = nm._widths
            assert mu % 4096 == 0 and mu_cells >= 4096
            assert mu < 32768  # the probe sized tighter than "wide"
        ks, fs, ws, hs, _ = tbl.active_entries(nm.table)
        o = np.lexsort(ks.T)
        tabs[mode] = (ks[o], fs[o], ws[o], hs[o])

    k1, f1, w1, h1 = tabs["auto"]
    k2, f2, w2, h2 = tabs["wide"]
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_allclose(f1, f2, atol=2e-3)


def test_overflow_widens_and_recompiles(params):
    """An undersized probe margin produces overflow; the lag-checked monitor
    widens the widths and rebuilds the fuse step (the widen path of
    VERDICT round-4 item 2)."""
    cfg = load_config([
        "model.voxel_size=0.02",       # fine grid -> many unique corners
        "model.table_capacity=262144",
        "model.min_pts_in_grid=1",
        "model.max_unique_per_frame=auto",
        "model.width_margin=0.05",     # deliberately undersized
    ])
    nm = NeuralMap(np.array([2.0, 2.0, 2.0], np.float32), cfg, params)
    frames = _synthetic_frames(n=6, h=64, w=64, seed=5)
    nm.integrate(frames[0])
    first = nm._widths
    assert int(np.asarray(nm.table.overflow)) > 0  # margin 0.05 undersizes
    for f in frames[1:]:
        nm.integrate(f)
    nm._note_overflow(flush=True)
    assert nm._overflow_seen > 0
    assert nm._widths[0] > first[0]   # widened
    # the widened step keeps fusing fine
    nm.integrate(frames[0])
    assert np.isfinite(np.asarray(nm.table.features)).all()
