"""Golden-value tests: JAX nets vs torch-CPU forward of the same weights.

The non-tcnn checkpoint (pretrained/pointnet.ckpt) has standard
Conv1d/BatchNorm/Linear layers, so torch (CPU) gives an independent oracle
for our folded-BN JAX applies.  The tcnn checkpoint has no runnable oracle in
this environment (tiny-cuda-nn is CUDA-only); its structure tests live in
test_checkpoint.py.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

from bnv_fusion_tpu import checkpoint as ckpt
from bnv_fusion_tpu import nn as bnn


@pytest.fixture(scope="module")
def torch_state(pretrained_torch_path):
    ck = ckpt.load_torch_checkpoint(pretrained_torch_path)
    return ck["state_dict"]


@pytest.fixture(scope="module")
def jax_params(torch_state):
    return ckpt.convert_pointnet_torch(torch_state)


def _torch_pointnet_forward(sd, x):
    """Reference PointNetEncoder eval forward (per-point features).

    Reimplements src/utils/pointnet_utils.py:228-265 with torch eval-mode ops.
    x: [N, 6] numpy -> [N, 8] numpy.
    """
    t = torch.from_numpy(x.astype(np.float32)).T.unsqueeze(0)  # [1, 6, N]
    with torch.no_grad():
        for i in range(1, 5):
            w = torch.from_numpy(sd[f"pointnet_backbone.conv{i}.weight"].copy())
            b = torch.from_numpy(sd[f"pointnet_backbone.conv{i}.bias"].copy())
            t = torch.nn.functional.conv1d(t, w, b)
            bn = {k: torch.from_numpy(sd[f"pointnet_backbone.bn{i}.{k}"].copy())
                  for k in ("weight", "bias", "running_mean", "running_var")}
            t = torch.nn.functional.batch_norm(
                t, bn["running_mean"], bn["running_var"], bn["weight"],
                bn["bias"], training=False, eps=1e-5)
            if i < 4:
                t = torch.relu(t)
    return t[0].T.numpy()


def _torch_decoder_forward(sd, local_xyz, feats):
    """Reference LocalNeRFModel geo path (modules.py:657-662,952-960)."""
    x = torch.from_numpy(local_xyz.astype(np.float32))
    pe = torch.cat([x, torch.sin(x), torch.cos(x)], dim=-1)  # num_fn=1
    h = torch.cat([pe, torch.from_numpy(feats.astype(np.float32))], dim=-1)
    with torch.no_grad():
        for i in range(4):
            w = torch.from_numpy(sd[f"nerf.geo_layer{i}.weight"].copy())
            b = torch.from_numpy(sd[f"nerf.geo_layer{i}.bias"].copy())
            h = torch.relu(torch.nn.functional.linear(h, w, b))
        w = torch.from_numpy(sd["nerf.fc_alpha.weight"].copy())
        b = torch.from_numpy(sd["nerf.fc_alpha.bias"].copy())
        out = torch.nn.functional.linear(h, w, b)
    return out.numpy()


def test_encoder_matches_torch(torch_state, jax_params, rng):
    x = (rng.rand(257, 6).astype(np.float32) * 2 - 1)
    golden = _torch_pointnet_forward(torch_state, x)
    ours = np.asarray(bnn.encoder_apply(jax_params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-3)


def test_decoder_matches_torch(torch_state, jax_params, rng):
    local = (rng.rand(129, 3).astype(np.float32) * 2 - 1)
    feats = rng.randn(129, 8).astype(np.float32)
    golden = _torch_decoder_forward(torch_state, local, feats)
    ours = np.asarray(bnn.decoder_apply(jax_params, jnp.asarray(local),
                                        jnp.asarray(feats)))
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-3)


def test_positional_encoding_shape_and_values():
    x = jnp.asarray(np.array([[0.5, -0.25, 1.0]], np.float32))
    pe = np.asarray(bnn.positional_encoding(x, num_fns=1))
    assert pe.shape == (1, 9)
    np.testing.assert_allclose(pe[0, :3], [0.5, -0.25, 1.0], atol=1e-6)
    np.testing.assert_allclose(pe[0, 3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(pe[0, 6:9], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
