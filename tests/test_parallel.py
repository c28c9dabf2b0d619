"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Verifies the DP fusion/optimization steps produce the SAME results as the
single-device paths — the sharding is an implementation detail, not a
semantics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import fusion, nn as bnn, optimize, render, tables as tbl
from bnv_fusion_tpu.parallel import (make_mesh, make_sharded_fuse_frame,
                                     make_sharded_optimize_step)


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))


def _scene(rng, n=512):
    bound_min = np.array([-1.0, -1.0, -1.0], np.float32)
    bound_max = np.array([1.0, 1.0, 1.0], np.float32)
    pts = (rng.rand(n, 3).astype(np.float32) * 1.2 - 0.6)
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return bound_min, bound_max, pts, normals


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_fuse_matches_single_device(rng, params):
    bound_min, bound_max, pts, normals = _scene(rng)
    vs, min_pts = 0.1, 2
    valid = jnp.ones((len(pts),), bool)

    # production default: the dense slot-map table (the sharded fuse is
    # slot-map only, same routing as the single-chip fast path)
    t1 = tbl.create_table(8, 4096, n_xyz=[24, 24, 24])
    t1, s1 = fusion.fuse_frame(
        t1, params, jnp.asarray(pts), jnp.asarray(normals), valid,
        jnp.asarray(bound_min), jnp.asarray(bound_max), vs, min_pts)

    mesh = make_mesh(8)
    step = make_sharded_fuse_frame(mesh, params, vs, min_pts,
                                   example_table=t1)
    t2 = tbl.create_table(8, 4096, n_xyz=[24, 24, 24])
    t2, s2 = step(t2, jnp.asarray(pts), jnp.asarray(normals), valid,
                  jnp.asarray(bound_min), jnp.asarray(bound_max))

    # same set of active voxels with the same values (slots may differ)
    k1, f1, w1, h1, _ = tbl.active_entries(t1)
    k2, f2, w2, h2, _ = tbl.active_entries(t2)
    o1 = np.lexsort(k1.T)
    o2 = np.lexsort(k2.T)
    np.testing.assert_array_equal(k1[o1], k2[o2])
    np.testing.assert_allclose(w1[o1], w2[o2], atol=1e-5)
    np.testing.assert_allclose(f1[o1], f2[o2], atol=1e-4, rtol=1e-4)
    # num_hits parity: the default config gates meshing on num_hits > 0
    # (mesh_require_observation), so a DP-fused map must carry the same
    # observation evidence as the single-device path
    np.testing.assert_allclose(h1[o1], h2[o2], atol=1e-5)
    assert float(np.sum(h2)) > 0
    assert abs(float(s1.n_avg_pts) - float(s2.n_avg_pts)) < 1e-3


def test_sharded_optimize_step_runs_and_matches_grads(rng, params):
    bound_min, bound_max, pts, normals = _scene(rng, n=1024)
    # min_pts=0 disables the decode mask so sparse random fusion still
    # produces gradient flow (the semantics of the mask are covered in
    # test_fusion.py)
    vs, min_pts = 0.1, 0
    t = tbl.create_table(8, 4096, n_xyz=[24, 24, 24])
    t, _ = fusion.fuse_frame(
        t, params, jnp.asarray(pts), jnp.asarray(normals),
        jnp.ones((len(pts),), bool), jnp.asarray(bound_min),
        jnp.asarray(bound_max), vs, 1)

    n_rays = 64
    uv = rng.rand(n_rays, 2).astype(np.float32) * np.array([100, 100])
    gt = (rng.rand(n_rays, 3).astype(np.float32) * 0.8 - 0.4)
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [0, 0, -1.5]
    intr = np.array([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]], np.float32)
    rays = render.Rays(
        uv=jnp.asarray(uv), gt_pts=jnp.asarray(gt),
        mask=jnp.ones((n_rays,), jnp.float32),
        neighbor_pts=jnp.asarray(gt[:, None, :]),
        neighbor_masks=jnp.ones((n_rays, 1), jnp.float32),
        T_wc=jnp.asarray(T_wc), intr=jnp.asarray(intr))

    mesh = make_mesh(8)
    n_xyz = jnp.asarray(np.array([22, 22, 22], np.int32))
    opt, step = make_sharded_optimize_step(
        mesh, params, vs, min_pts, truncated_units=2, truncated_dist=0.1,
        ray_max_dist=2.0, example_table=t, lr=1e-3)
    opt_state = opt.init(t.features)
    feats, weights, opt_state, loss = step(
        t.features, t.weights, opt_state, t, rays, jax.random.key(7),
        jnp.asarray(bound_min), n_xyz, None)
    assert np.isfinite(float(loss))
    # the update must have moved some latents
    assert float(jnp.max(jnp.abs(feats - t.features))) > 0
    # weights only grew (count_optim bump)
    assert float(jnp.min(weights - t.weights)) >= 0


def _frame_inputs(rng, h=48, w=64):
    """A synthetic depth frame looking at a slanted plane."""
    depth = (1.0 + 0.3 * rng.rand(h, w)).astype(np.float32)
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [0, 0, -1.2]
    intr = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                    np.float32)
    return (jnp.asarray(depth), jnp.asarray(T_wc), jnp.asarray(intr))


def test_sharded_optimize_iter_matches_single_device(rng, params):
    """The ray-DP iteration (make_sharded_optimize_iter) is a drop-in for
    the single-device optimize step: same rays, same chunk schedule, same
    masked mean, same bumps — results equal up to float reduction order
    (VERDICT round-2 item 2)."""
    from bnv_fusion_tpu.parallel import make_sharded_optimize_iter

    bound_min, bound_max, pts, normals = _scene(rng, n=2048)
    vs, min_pts = 0.1, 1
    t = tbl.create_table(8, 4096, n_xyz=[24, 24, 24])
    t, _ = fusion.fuse_frame(
        t, params, jnp.asarray(pts), jnp.asarray(normals),
        jnp.ones((len(pts),), bool), jnp.asarray(bound_min),
        jnp.asarray(bound_max), vs, min_pts)

    depth, T_wc, intr = _frame_inputs(rng)
    n_xyz = jnp.asarray(np.array([22, 22, 22], np.int32))
    kw = dict(voxel_size=vs, min_pts_in_grid=min_pts, truncated_units=2,
              truncated_dist=0.1, ray_max_dist=2.0)
    n_rays, splits = 128, 64

    opt1, step1, _multi = optimize.make_optimize_step(
        params, n_rays=n_rays, train_ray_splits=splits, lr=1e-3, **kw)
    # fresh buffer copies: both steps donate their state, and the states
    # would otherwise alias the same table buffers
    s1 = optimize.init_optim_state(opt1, t)._replace(
        features=jnp.array(t.features), weights=jnp.array(t.weights))

    mesh = make_mesh(8)
    opt8, step8 = make_sharded_optimize_iter(
        mesh, params, n_rays=n_rays, train_ray_splits=splits,
        example_table=t, lr=1e-3, **kw)
    s8 = optimize.init_optim_state(opt8, t)._replace(
        features=jnp.array(t.features), weights=jnp.array(t.weights))

    for i in range(3):
        key = jax.random.key(100 + i)
        s1, loss1 = step1(s1, t, depth, T_wc, intr,
                          jnp.asarray(bound_min), n_xyz, None, key)
        s8, loss8 = step8(s8, t, depth, T_wc, intr,
                          jnp.asarray(bound_min), n_xyz, None, key)
        # chunk losses: step1 returns the mean over chunks, step8 likewise
        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.weights), np.asarray(s8.weights),
                               atol=1e-5)
    # features after 3 Adam steps: the per-shard vs global cotangent
    # sort-reduce orders differ (float reassociation only — measured grad
    # deltas ~1e-7), and Adam's m/sqrt(v) direction amplifies them where v
    # is tiny; p99 divergence measured 1.2e-5, max 4.3e-4 (round 5)
    np.testing.assert_allclose(np.asarray(s1.features),
                               np.asarray(s8.features), atol=2e-3)


def test_neural_map_sharded_optimize(rng, params):
    """NeuralMap.optimize with trainer.optimize_devices=8 runs the wired
    sharded path and matches the single-device trajectory."""
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.pipeline import NeuralMap

    overrides = [
        "model.voxel_size=0.05",
        "dataset.num_pixels=128",
        "model.train_ray_splits=64",
        "model.table_capacity=16384",
        "model.min_pts_in_grid=1",
        # pin the sequential chunk schedule: the ray-DP path ignores
        # parallel_ray_chunks (it shards chunks across devices), so the
        # equivalence being tested is against the sequential single-device
        # trajectory
        "model.parallel_ray_chunks=false",
    ]
    dims = np.array([2.0, 2.0, 2.0], np.float32)
    frames = []
    for i in range(2):
        depth, T_wc, intr = _frame_inputs(rng)
        frames.append({"depth": np.asarray(depth), "T_wc": np.asarray(T_wc),
                       "intr_mat": np.asarray(intr), "frame_id": i})

    results = {}
    for dev in (1, 8):
        cfg = load_config(overrides + [f"trainer.optimize_devices={dev}"])
        nm = NeuralMap(dims, cfg, params)
        for f in frames:
            nm.integrate(f)
        nm.optimize(3)
        results[dev] = np.asarray(nm.table.features)
        assert np.all(np.isfinite(results[dev]))
    assert np.abs(results[1]).max() > 0
    # reduction-order-only divergence, Adam-amplified (see the iter test)
    np.testing.assert_allclose(results[8], results[1], atol=2e-3)


def test_sharded_pretrain_matches_single_device(rng):
    """The DP embedding-pretraining step (batch sharded over 8 virtual
    devices) tracks the single-device trainer step: same loss, same params
    trajectory over several Adam steps."""
    import optax

    from bnv_fusion_tpu.models.local_point_fusion import pretrain_loss
    from bnv_fusion_tpu.parallel import make_sharded_pretrain_step
    from functools import partial

    params0 = jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(3)))
    reg_w = 1e-3
    sched = optax.exponential_decay(1e-3, transition_steps=10,
                                    decay_rate=0.5, staircase=True)
    b, n, q = 16, 32, 24

    def make_batch(i):
        r = np.random.RandomState(100 + i)
        return (r.randn(b, n, 6).astype(np.float32),
                r.randint(4, n, size=(b,)),
                r.rand(b, q, 3).astype(np.float32) * 2 - 1,
                (r.rand(b, q).astype(np.float32) - 0.5))

    # single-device reference trajectory
    opt1 = optax.adam(sched)
    grad_fn = jax.value_and_grad(partial(pretrain_loss, reg_weight=reg_w),
                                 has_aux=True)

    @jax.jit
    def step1(params, opt_state, ip, nk, tp, gt):
        (loss, logs), g = grad_fn(params, ip, nk, tp, gt)
        updates, opt_state = opt1.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    opt2 = optax.adam(sched)
    step8 = make_sharded_pretrain_step(make_mesh(8), opt2, reg_weight=reg_w)

    p1, s1 = params0, opt1.init(params0)
    p8, s8 = params0, opt2.init(params0)
    for i in range(4):
        ip, nk, tp, gt = make_batch(i)
        p1, s1, l1 = step1(p1, s1, ip, nk, tp, gt)
        p8, s8, l8, logs8 = step8(p8, s8, jnp.asarray(ip), jnp.asarray(nk),
                                  jnp.asarray(tp), jnp.asarray(gt))
        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
        assert set(logs8) == {"bce_loss", "reg_loss"}
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=1e-6)


def test_trainer_pretrain_devices_knob(rng):
    """FusionPointNetTrainer wires trainer.pretrain_devices into the
    sharded step (train_step API unchanged)."""
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.models.local_point_fusion import FusionPointNetTrainer

    cfg = load_config(["model=fusion_pointnet_model",
                       "dataset=synthetic_patches",
                       "trainer.pretrain_devices=8"])
    tr = FusionPointNetTrainer(cfg)
    r = np.random.RandomState(0)
    batch = {
        "input_pts": r.randn(16, 64, 6).astype(np.float32),
        "training_pts": r.rand(16, 24, 3).astype(np.float32) * 2 - 1,
        "gt": (r.rand(16, 24).astype(np.float32) - 0.5),
    }
    loss, logs = tr.train_step(batch)
    assert np.isfinite(loss)
    assert "bce_loss" in logs


def test_neural_map_dp_fuse(rng, params):
    """trainer.fuse_devices=8 (default table layout) routes
    NeuralMap.integrate through the points-sharded DP fuse step with
    single-device semantics (VERDICT round-3 item 6: the wired path)."""
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.pipeline import NeuralMap

    overrides = [
        "model.voxel_size=0.05",
        "model.table_capacity=16384",
        "model.min_pts_in_grid=1",
        # the sharded reduce computes exact f32 partials; compare against
        # the single-device EXACT path (bf16 sort payloads off), else the
        # diff is dominated by the single-device bf16 noise (~8e-4)
        "model.fuse_sort_bf16=false",
    ]
    dims = np.array([2.0, 2.0, 2.0], np.float32)
    lrng = np.random.RandomState(7)
    frames = []
    for i in range(2):
        depth, T_wc, intr = _frame_inputs(lrng)
        frames.append({"depth": np.asarray(depth), "T_wc": np.asarray(T_wc),
                       "intr_mat": np.asarray(intr), "frame_id": i})

    tabs = {}
    for dev in (1, 8):
        cfg = load_config(overrides + [f"trainer.fuse_devices={dev}"])
        nm = NeuralMap(dims, cfg, params)
        # exercise the batch entry point too (it falls back to per-frame
        # sharded launches when fuse_devices > 1)
        nm.integrate_batches([frames])
        ks, fs, ws, hs, _ = tbl.active_entries(nm.table)
        tabs[dev] = {tuple(c): (f, w, h)
                     for c, f, w, h in zip(ks, fs, ws, hs)}
        assert int(np.asarray(nm.table.overflow)) == 0
    assert set(tabs[1]) == set(tabs[8])
    for c, (f, w, h) in tabs[1].items():
        f2, w2, h2 = tabs[8][c]
        # both paths are exact f32, but the shard_map program and the
        # single-device program compile to different matmul tilings /
        # reassociations, and the multithreaded CPU GEMM accumulation
        # order varies run-to-run under load (measured up to ~2e-4
        # absolute on O(1) features) — cross-program XLA noise.  A real
        # semantics bug (wrong points, broken collective) errs >> 1e-2;
        # the exactness claim is carried by the voxel-set equality and
        # the exactly-equal weights/hits below.
        np.testing.assert_allclose(f2, f, rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(w2, w, rtol=1e-5)
        np.testing.assert_allclose(h2, h, rtol=1e-5)


def test_sharded_fuse_collectives_are_compacted(params):
    """Pin the ICI-traffic shape of make_sharded_fuse_frame (VERDICT r4
    item 8): the all-gathered per-chip partials must be the COMPACTED
    [U]-row arrays (D x U x (F+2) total elements), and no capacity-sized
    collective may appear — a refactor that reintroduces the early
    capacity-wide psum-accumulator design (parallel/dp.py:45-57) fails
    here before it ships.
    """
    import re

    vs, min_pts = 0.1, 2
    feat_dims, capacity, max_unique = 8, 65536, 128
    t = tbl.create_table(feat_dims, capacity, n_xyz=[48, 48, 48])
    mesh = make_mesh(8)
    n_dev = int(mesh.devices.size)
    step = make_sharded_fuse_frame(mesh, params, vs, min_pts,
                                   example_table=t,
                                   max_unique=max_unique)
    n = 512
    pts = jnp.zeros((n, 3), jnp.float32)
    normals = jnp.ones((n, 3), jnp.float32)
    valid = jnp.ones((n,), bool)
    bm = jnp.asarray(np.array([-1, -1, -1], np.float32))
    bx = jnp.asarray(np.array([1, 1, 1], np.float32))
    hlo = step.lower(t, pts, normals, valid, bm, bx).as_text()

    # every cross-chip collective operand, by element count
    coll = re.compile(
        r'"?(?:stablehlo\.)?(all_gather|all_reduce|all_to_all|'
        r'collective_permute)"?.*?tensor<([0-9x]+)')
    sizes = []
    for m in coll.finditer(hlo):
        dims = [int(d) for d in m.group(2).split("x") if d]
        n_elem = int(np.prod(dims)) if dims else 1
        sizes.append((m.group(1), n_elem, dims))
    assert sizes, "no collectives found — lowering format changed?"

    # the largest legitimate collective is the feature-sum all-gather:
    # U rows x F channels gathered across D chips
    budget = n_dev * max_unique * feat_dims
    for op, n_elem, dims in sizes:
        assert n_elem <= budget, (
            f"{op} moves {n_elem} elements {dims} — exceeds the compacted "
            f"partial budget D*U*F={budget}; a capacity-wide collective "
            f"(capacity={capacity}) has been reintroduced")
        assert capacity not in dims and t.slot_map.shape[0] not in dims, (
            f"{op} operand {dims} is capacity-/n_voxel-sized")

    # and the compacted gathers are actually present (keys + counts + sums)
    gathered = [s for s in sizes if s[0] == "all_gather"]
    assert len(gathered) >= 3, (
        f"expected >= 3 compacted all-gathers (keys/counts/sums), "
        f"found {gathered}")
