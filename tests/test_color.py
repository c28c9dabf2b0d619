"""RGB through the pipeline: color TSDF fusion (reference
third_parties/fusion.py:208-294 fuses a packed-BGR running mean with the same
weights as the sdf) and colored mesh export (fusion.py:296-316)."""

import os

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import mesh as mesh_mod, tsdf
from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.datasets import get_dataset


def _plane_frame(h=60, w=80, z=1.0):
    intr = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                    np.float32)
    depth = np.full((h, w), z, np.float32)
    T_wc = np.eye(4, dtype=np.float32)
    return depth, intr, T_wc


def test_tsdf_color_running_mean():
    dims = np.array([3.0, 3.0, 3.0], np.float32)
    vol, trunc = tsdf.create_tsdf_volume(dims, 0.05, with_color=True)
    depth, intr, T_wc = _plane_frame()

    red = np.zeros(depth.shape + (3,), np.float32)
    red[..., 0] = 200.0
    blue = np.zeros(depth.shape + (3,), np.float32)
    blue[..., 2] = 100.0

    vol = tsdf.integrate(vol, jnp.asarray(depth), jnp.asarray(intr),
                         jnp.asarray(T_wc), 0.05, rgb=jnp.asarray(red))
    w1 = np.asarray(vol.weight)
    c1 = np.asarray(vol.color)
    observed = w1 > 0
    assert observed.any()
    # every observed voxel saw pure red
    np.testing.assert_allclose(c1[observed][:, 0], 200.0, atol=1e-4)
    np.testing.assert_allclose(c1[observed][:, 1:], 0.0, atol=1e-4)

    # second frame in blue: running mean with equal weights -> (100, 0, 50)
    vol = tsdf.integrate(vol, jnp.asarray(depth), jnp.asarray(intr),
                         jnp.asarray(T_wc), 0.05, rgb=jnp.asarray(blue))
    c2 = np.asarray(vol.color)
    np.testing.assert_allclose(c2[observed][:, 0], 100.0, atol=1e-3)
    np.testing.assert_allclose(c2[observed][:, 2], 50.0, atol=1e-3)


def test_tsdf_without_color_ignores_rgb_field():
    dims = np.array([2.0, 2.0, 2.0], np.float32)
    vol, _ = tsdf.create_tsdf_volume(dims, 0.05)
    assert vol.color is None
    depth, intr, T_wc = _plane_frame()
    vol = tsdf.integrate(vol, jnp.asarray(depth), jnp.asarray(intr),
                         jnp.asarray(T_wc), 0.05)
    assert vol.color is None


def test_sample_color_trilinear():
    dims = np.array([1.0, 1.0, 1.0], np.float32)
    vol, _ = tsdf.create_tsdf_volume(dims, 0.1, with_color=True)
    # constant color everywhere -> any sample returns it
    vol = vol.replace(color=jnp.full(vol.color.shape, 37.0))
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.4, 0.4, (32, 3))
                      .astype(np.float32))
    c = np.asarray(tsdf.sample_color(vol, pts, 0.1))
    assert c.dtype == np.uint8
    np.testing.assert_array_equal(c, 37)


def test_colored_mesh_end_to_end(tmp_path, pretrained_tcnn_path):
    """fuse_color on: integrate synthetic RGB-D, mesh carries plausible
    vertex colors, PLY roundtrips them."""
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.datasets.synth_scene import procedural_albedo
    from bnv_fusion_tpu.pipeline import NeuralMap

    pretrained_params = load_pretrained(pretrained_tcnn_path)

    cfg = load_config([
        "dataset=synthetic_demo",
        "dataset.img_res=[240,320]",
        "dataset.num_images=12",
        "dataset.load_color=true",
        "model.voxel_size=0.04",
        "model.table_capacity=262144",
        "model.min_pts_in_grid=4",
        "model.max_unique_per_frame=65536",
        "model.fuse_color=true",
    ])
    ds = get_dataset(cfg, "val")
    frame = ds[0]
    assert frame["rgb"].shape == frame["depth"].shape + (3,)

    nm = NeuralMap(ds.dimensions, cfg, pretrained_params)
    for i in range(len(ds)):
        nm.integrate(ds[i])
    mesh = nm.extract_mesh(use_delta=True)
    assert mesh is not None and len(mesh.vertices) > 0
    assert mesh.colors is not None and mesh.colors.shape == \
        (len(mesh.vertices), 3)
    # colors should correlate with the procedural albedo at the vertices
    expect = procedural_albedo(mesh.vertices)
    got = mesh.colors.astype(np.float32)
    err = np.abs(got - expect).mean()
    assert err < 60.0, f"mean vertex color error {err}"
    # and be far from all-zero/constant
    assert got.std() > 10.0

    path = os.path.join(tmp_path, "colored.ply")
    mesh_mod.save_ply(path, mesh)
    back = mesh_mod.load_ply(path)
    np.testing.assert_array_equal(back.colors, mesh.colors)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)


def test_post_process_keeps_colors():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    c = np.array([[255, 0, 0]] * 4, np.uint8)
    out = mesh_mod.post_process_mesh(mesh_mod.Mesh(v, f, c), 0.01)
    assert out.colors is not None and len(out.colors) == len(out.vertices)
    np.testing.assert_array_equal(out.colors[0], [255, 0, 0])
