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


def test_merged_fuse_seg_kernel_matches_xla(pretrained_tcnn_path):
    """fuse_frames_merged with the batched Pallas segmented-reduce kernel
    (seg_kernel, interpret mode here) fuses the same tables as the XLA
    cumsum path."""
    import jax.numpy as jnp

    from bnv_fusion_tpu import fusion, geometry
    from bnv_fusion_tpu import voxel as vx

    cfg = load_config([
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=3", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ])
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(3)]
    min_c, max_c, n_xyz = vx.get_world_range(ds.dimensions, 0.06)
    bound_min, bound_max = jnp.asarray(min_c), jnp.asarray(max_c)

    pts, nrm, val = [], [], []
    for f in frames:
        depth = jnp.asarray(f["depth"], jnp.float32)
        intr = jnp.asarray(f["intr_mat"], jnp.float32)
        T_wc = jnp.asarray(f["T_wc"], jnp.float32)
        xyz = geometry.depth_to_xyz(depth, intr)
        nw = -geometry.rotate_vectors(
            T_wc, geometry.normals_from_depth(
                depth, intr, mask=depth > 0).reshape(-1, 3))
        pts.append(geometry.transform_points(T_wc, xyz.reshape(-1, 3)))
        nrm.append(nw)
        val.append((depth > 0).reshape(-1))
    pts, nrm, val = jnp.stack(pts), jnp.stack(nrm), jnp.stack(val)

    kw = dict(voxel_size=0.06, min_pts_in_grid=3, max_unique=4096,
              max_unique_cells=2048)
    t_x = tbl.create_table(8, 65536, n_xyz=n_xyz)
    t_x, s_x = fusion.fuse_frames_merged(
        t_x, params, pts, nrm, val, bound_min, bound_max, **kw)
    t_k = tbl.create_table(8, 65536, n_xyz=n_xyz)
    t_k, s_k = fusion.fuse_frames_merged(
        t_k, params, pts, nrm, val, bound_min, bound_max,
        seg_kernel="interpret", **kw)

    assert int(np.asarray(t_x.overflow)) == 0
    assert int(np.asarray(t_k.overflow)) == 0
    k1, f1, w1, h1, _ = tbl.active_entries(t_x)
    k2, f2, w2, h2, _ = tbl.active_entries(t_k)
    o1, o2 = np.lexsort(k1.T), np.lexsort(k2.T)
    np.testing.assert_array_equal(k1[o1], k2[o2])
    np.testing.assert_allclose(w1[o1], w2[o2], atol=1e-5)
    np.testing.assert_allclose(h1[o1], h2[o2], atol=1e-5)
    # the XLA path's mean-centered cumsum carries ~1e-4 relative
    # cancellation noise; the kernel sums segments directly (more accurate)
    np.testing.assert_allclose(f1[o1], f2[o2], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s_x.n_valid_pts),
                               np.asarray(s_k.n_valid_pts))


def test_merged_fuse_sort_bf16_close_to_f32(pretrained_tcnn_path):
    """The packed-bf16 stage-2 sort payload (model.fuse_sort_bf16) fuses
    tables within bf16 quantization of the exact path."""
    import jax.numpy as jnp

    from bnv_fusion_tpu import fusion, geometry
    from bnv_fusion_tpu import voxel as vx

    cfg = load_config([
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=2", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ])
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(2)]
    min_c, max_c, n_xyz = vx.get_world_range(ds.dimensions, 0.06)
    bound_min, bound_max = jnp.asarray(min_c), jnp.asarray(max_c)

    pts, nrm, val = [], [], []
    for f in frames:
        depth = jnp.asarray(f["depth"], jnp.float32)
        intr = jnp.asarray(f["intr_mat"], jnp.float32)
        T_wc = jnp.asarray(f["T_wc"], jnp.float32)
        xyz = geometry.depth_to_xyz(depth, intr)
        nw = -geometry.rotate_vectors(
            T_wc, geometry.normals_from_depth(
                depth, intr, mask=depth > 0).reshape(-1, 3))
        pts.append(geometry.transform_points(T_wc, xyz.reshape(-1, 3)))
        nrm.append(nw)
        val.append((depth > 0).reshape(-1))
    pts, nrm, val = jnp.stack(pts), jnp.stack(nrm), jnp.stack(val)

    kw = dict(voxel_size=0.06, min_pts_in_grid=3, max_unique=4096,
              max_unique_cells=2048, seg_kernel="interpret")
    t_a = tbl.create_table(8, 65536, n_xyz=n_xyz)
    t_a, _ = fusion.fuse_frames_merged(
        t_a, params, pts, nrm, val, bound_min, bound_max, **kw)
    t_b = tbl.create_table(8, 65536, n_xyz=n_xyz)
    t_b, _ = fusion.fuse_frames_merged(
        t_b, params, pts, nrm, val, bound_min, bound_max,
        sort_bf16=True, **kw)

    k1, f1, w1, _, _ = tbl.active_entries(t_a)
    k2, f2, w2, _, _ = tbl.active_entries(t_b)
    o1, o2 = np.lexsort(k1.T), np.lexsort(k2.T)
    np.testing.assert_array_equal(k1[o1], k2[o2])
    np.testing.assert_array_equal(w1[o1], w2[o2])  # counts ride exact int32
    # features quantized to bf16 per-cell partials: ~1% worst case
    np.testing.assert_allclose(f1[o1], f2[o2], atol=0.02, rtol=0.02)


def test_merged_fuse_width_invariance(pretrained_tcnn_path):
    """Compaction widths are pure padding: any widths that fit the scene
    (overflow 0) fuse the same voxel set with exactly equal counts/weights/
    hits; feature sums agree within f32 summation-order noise (the XLA
    path's mean-centered cumsum shifts its ~1e-4 cancellation with pad
    width; the kernel path sums segments directly and is far tighter).
    This is the property the occupancy-sized coarse operating point relies
    on (RESULTS.md: probe_seg_count-sized widths took the voxel-0.02 bench
    40.1 -> 54.5 fps)."""
    import jax.numpy as jnp

    from bnv_fusion_tpu import fusion, geometry
    from bnv_fusion_tpu import voxel as vx

    cfg = load_config([
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=3", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ])
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(3)]
    min_c, max_c, n_xyz = vx.get_world_range(ds.dimensions, 0.06)
    bound_min, bound_max = jnp.asarray(min_c), jnp.asarray(max_c)

    pts, nrm, val = [], [], []
    for f in frames:
        depth = jnp.asarray(f["depth"], jnp.float32)
        intr = jnp.asarray(f["intr_mat"], jnp.float32)
        T_wc = jnp.asarray(f["T_wc"], jnp.float32)
        xyz = geometry.depth_to_xyz(depth, intr)
        nw = -geometry.rotate_vectors(
            T_wc, geometry.normals_from_depth(
                depth, intr, mask=depth > 0).reshape(-1, 3))
        pts.append(geometry.transform_points(T_wc, xyz.reshape(-1, 3)))
        nrm.append(nw)
        val.append((depth > 0).reshape(-1))
    pts, nrm, val = jnp.stack(pts), jnp.stack(nrm), jnp.stack(val)

    def fuse(max_unique, max_unique_cells, **extra):
        t = tbl.create_table(8, 65536, n_xyz=n_xyz)
        t, _ = fusion.fuse_frames_merged(
            t, params, pts, nrm, val, bound_min, bound_max,
            voxel_size=0.06, min_pts_in_grid=3, max_unique=max_unique,
            max_unique_cells=max_unique_cells, **extra)
        assert int(np.asarray(t.overflow)) == 0
        k, f, w, h, _ = tbl.active_entries(t)
        o = np.lexsort(k.T)
        return k[o], f[o], w[o], h[o]

    for extra, f_atol in (({}, 2e-3), ({"seg_kernel": "interpret"}, 1e-5)):
        k1, f1, w1, h1 = fuse(4096, 2048, **extra)
        k2, f2, w2, h2 = fuse(8192, 4096, **extra)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(w1, w2)   # counts ride exact int32
        np.testing.assert_array_equal(h1, h2)
        # XLA path: mean-centered cumsum cancellation (~1e-4 documented)
        # moves with pad width; kernel path: direct segment sums, only
        # tile-boundary summation order shifts
        np.testing.assert_allclose(f1, f2, atol=f_atol)


def test_tsdf_every_subsamples_prior_cadence(pretrained_tcnn_path):
    """model.tsdf_every=2: the batched launch integrates every 2nd depth
    into the prior at obs_weight=2 (same total weight); the latent table
    is unaffected."""
    import jax.numpy as jnp

    from bnv_fusion_tpu import tsdf

    base = [
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=4", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ]
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    cfg1 = load_config(base)
    cfg2 = load_config(base + ["model.tsdf_every=2"])
    ds = get_dataset(cfg1, "val")
    frames = [ds[i] for i in range(4)]

    nm2 = NeuralMap(ds.dimensions, cfg2, params)
    nm2.integrate_batch(frames)

    # manual expectation: frames 0 and 2 at obs_weight 2
    nm_ref = NeuralMap(ds.dimensions, cfg1, params)
    vol = nm_ref.tsdf_vol
    for i in (0, 2):
        vol = tsdf.integrate(
            vol, jnp.asarray(frames[i]["depth"], jnp.float32),
            jnp.asarray(frames[i]["intr_mat"], jnp.float32),
            jnp.asarray(frames[i]["T_wc"], jnp.float32),
            nm_ref.tsdf_voxel_size, obs_weight=2.0)
    np.testing.assert_allclose(np.asarray(nm2.tsdf_vol.sdf),
                               np.asarray(vol.sdf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nm2.tsdf_vol.weight),
                               np.asarray(vol.weight), atol=1e-6)

    # latent fusion identical to the every-frame config
    nm1 = NeuralMap(ds.dimensions, cfg1, params)
    nm1.integrate_batch(frames)
    np.testing.assert_allclose(np.asarray(nm2.table.features),
                               np.asarray(nm1.table.features), atol=1e-6)


def test_merged_fuse_sort1_gather_bit_identical(pretrained_tcnn_path):
    """model.fuse_sort1_gather (sort stage 1 by (cell, mcode, index), then
    gather the float payloads) is BIT-identical to the 8-operand sort:
    lax.sort is stable and the gather reproduces the same rows."""
    import jax
    import jax.numpy as jnp

    from bnv_fusion_tpu import fusion, geometry
    from bnv_fusion_tpu import voxel as vx

    cfg = load_config([
        "model.voxel_size=0.06", "model.min_pts_in_grid=3",
        "dataset.num_images=2", "dataset.img_res=[60,80]",
        "model.table_capacity=65536",
    ])
    from bnv_fusion_tpu.datasets import get_dataset

    params = load_pretrained(pretrained_tcnn_path)
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(2)]
    min_c, max_c, n_xyz = vx.get_world_range(ds.dimensions, 0.06)
    bound_min, bound_max = jnp.asarray(min_c), jnp.asarray(max_c)

    pts, nrm, val = [], [], []
    for f in frames:
        depth = jnp.asarray(f["depth"], jnp.float32)
        intr = jnp.asarray(f["intr_mat"], jnp.float32)
        T_wc = jnp.asarray(f["T_wc"], jnp.float32)
        xyz = geometry.depth_to_xyz(depth, intr)
        nw = -geometry.rotate_vectors(
            T_wc, geometry.normals_from_depth(
                depth, intr, mask=depth > 0).reshape(-1, 3))
        pts.append(geometry.transform_points(T_wc, xyz.reshape(-1, 3)))
        nrm.append(nw)
        val.append((depth > 0).reshape(-1))
    pts, nrm, val = jnp.stack(pts), jnp.stack(nrm), jnp.stack(val)

    kw = dict(voxel_size=0.06, min_pts_in_grid=3, max_unique=4096,
              max_unique_cells=2048)
    t_a = tbl.create_table(8, 65536, n_xyz=n_xyz)
    t_a, _ = fusion.fuse_frames_merged(
        t_a, params, pts, nrm, val, bound_min, bound_max, **kw)
    t_b = tbl.create_table(8, 65536, n_xyz=n_xyz)
    t_b, _ = fusion.fuse_frames_merged(
        t_b, params, pts, nrm, val, bound_min, bound_max,
        sort1_gather=True, **kw)
    np.testing.assert_array_equal(np.asarray(t_a.features),
                                  np.asarray(t_b.features))
    np.testing.assert_array_equal(np.asarray(t_a.weights),
                                  np.asarray(t_b.weights))
    np.testing.assert_array_equal(np.asarray(t_a.num_hits),
                                  np.asarray(t_b.num_hits))

    # degenerate (lattice-aligned) points exercise the mcode tiebreak: the
    # stage-1 front itself must match bitwise, including duplicates
    rng = np.random.RandomState(0)
    p = rng.uniform(-0.9, 0.9, size=(512, 3)).astype(np.float32)
    p[::3] = np.round(p[::3] / 0.06) * 0.06       # exact plane hits
    nr = rng.normal(size=(512, 3)).astype(np.float32)
    nr /= np.linalg.norm(nr, axis=1, keepdims=True)
    v = np.ones(512, bool)
    args = (jnp.asarray(p), jnp.asarray(nr), jnp.asarray(v),
            jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]), 0.06,
            jnp.asarray([34, 34, 34]), 34 * 34 * 34)
    a = fusion._cellsort_sort1(*args)
    b = fusion._cellsort_sort1(*args, sort1_gather=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_integrate_batches_matches_sequential(pipeline_cfg_factory=None):
    """integrate_batches (prefetch-overlap staging) is bitwise identical to
    sequential integrate_batch calls."""
    import numpy as np

    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        "model.voxel_size=0.05", "model.table_capacity=65536",
        "dataset.num_images=8", "dataset.img_res=[60,80]",
        "dataset.stage_raw_depth=true",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    from bnv_fusion_tpu.datasets import get_dataset
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(len(ds))]
    batches = [frames[:4], frames[4:8]]

    nm1 = NeuralMap(ds.dimensions, cfg, params)
    for b in batches:
        nm1.integrate_batch(b)
    nm2 = NeuralMap(ds.dimensions, cfg, params)
    nm2.integrate_batches(batches)
    np.testing.assert_array_equal(np.asarray(nm1.table.features),
                                  np.asarray(nm2.table.features))
    np.testing.assert_array_equal(np.asarray(nm1.table.weights),
                                  np.asarray(nm2.table.weights))
    np.testing.assert_array_equal(np.asarray(nm1.tsdf_vol.sdf),
                                  np.asarray(nm2.tsdf_vol.sdf))
