"""Pallas fused feature-major MLP matches nn.mlp_apply."""

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu.kernels.fused_mlp import FusedMLP


def test_fused_mlp_matches_mlp_apply():
    params = jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(0)))
    enc = params["encoder"]
    x = jnp.asarray(np.random.RandomState(0).randn(3000, 6)
                    .astype(np.float32))
    ref = bnn.mlp_apply(enc, x)
    fused = FusedMLP(enc, block_m=512)
    got = fused(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_mlp_batched_shape():
    params = jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(1)))
    enc = params["encoder"]
    x = jnp.asarray(np.random.RandomState(1).randn(7, 11, 6)
                    .astype(np.float32))
    ref = bnn.mlp_apply(enc, x)
    got = FusedMLP(enc, block_m=256)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
