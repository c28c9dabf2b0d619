"""Dense TSDF prior tests (reference third_parties/fusion.py semantics)."""

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import tsdf


def _intr():
    return jnp.asarray(np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]],
                                np.float32))


def test_create_volume_init_quirk():
    vol, trunc = tsdf.create_tsdf_volume(np.array([2.0, 2.0, 2.0]), 0.05)
    assert trunc == 0.25
    # reference initializes the sdf to -trunc_margin (fusion.py:30)
    assert float(vol.sdf[0, 0, 0]) == -trunc
    assert float(vol.weight.max()) == 0.0


def test_integrate_wall():
    vs = 0.05
    vol, trunc = tsdf.create_tsdf_volume(np.array([2.0, 2.0, 4.0]), vs)
    depth = jnp.ones((120, 160), jnp.float32) * 1.5
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[2, 3] = -2.1  # camera at z=-2.1 world, wall at z=-0.6 world
    vol = tsdf.integrate(vol, depth, _intr(), jnp.asarray(T_wc), vs)

    sdf = np.asarray(vol.sdf)
    w = np.asarray(vol.weight)
    origin = np.asarray(vol.origin)
    assert w.max() == 1.0

    def vox(world):
        return tuple(np.round((np.asarray(world) - origin) / vs).astype(int))

    # far in front of the wall (on the optical axis): dist clipped to 1
    i = vox([0, 0, -1.6])
    assert w[i] == 1.0 and abs(sdf[i] - 1.0) < 1e-5
    # near the wall: linear ramp diff/trunc
    i = vox([0, 0, -0.6 - 0.1])
    assert w[i] == 1.0 and abs(sdf[i] - 0.1 / trunc) < 0.15
    # just behind the wall within trunc: negative
    i = vox([0, 0, -0.6 + 0.1])
    assert w[i] == 1.0 and sdf[i] < 0
    # far behind the wall: untouched (weight 0, init value)
    i = vox([0, 0, 0.9])
    assert w[i] == 0.0 and abs(sdf[i] + trunc) < 1e-6


def test_integrate_running_mean():
    vs = 0.05
    vol, trunc = tsdf.create_tsdf_volume(np.array([1.0, 1.0, 2.0]), vs)
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[2, 3] = -1.0
    d1 = jnp.ones((120, 160), jnp.float32) * 0.8
    d2 = jnp.ones((120, 160), jnp.float32) * 0.9
    vol = tsdf.integrate(vol, d1, _intr(), jnp.asarray(T_wc), vs)
    vol = tsdf.integrate(vol, d2, _intr(), jnp.asarray(T_wc), vs)
    origin = np.asarray(vol.origin)
    i = tuple(np.round((np.array([0, 0, -0.35]) - origin) / vs).astype(int))
    # voxel at z=-0.35 (cam depth 0.65): diffs 0.15/0.25 -> 0.6, 1.0 -> mean 0.8
    got = float(np.asarray(vol.sdf)[i])
    assert abs(got - 0.8) < 0.12
    assert float(np.asarray(vol.weight)[i]) == 2.0


def test_prepare_sdf_delta_scaling():
    vol, trunc = tsdf.create_tsdf_volume(np.array([1.0, 1.0, 1.0]), 0.025)
    vol = vol.replace(sdf=jnp.ones_like(vol.sdf) * 0.5)
    delta = tsdf.prepare_sdf_delta(vol, 0.025, truncated_dist=0.05,
                                   sdf_delta_weight=0.1)
    # 0.5 * 0.125 = 0.0625 metric -> clip 0.05 -> x0.1 = 0.005
    np.testing.assert_allclose(np.asarray(delta), 0.005, atol=1e-7)
