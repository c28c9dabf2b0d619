"""Pallas fused decode kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu.kernels import fused_corner_decode, fused_decode_available


def _params():
    return jax.tree.map(jnp.asarray, bnn.init_model(jax.random.key(3)))


def test_available_for_tcnn_topology():
    assert fused_decode_available(_params())


def test_fused_decode_matches_xla(rng):
    params = _params()
    n = 2048
    local = jnp.asarray((rng.rand(n, 8, 3) * 2 - 1).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 8, 8).astype(np.float32))
    tw = jnp.asarray(rng.rand(n, 8).astype(np.float32))
    tw = tw / tw.sum(-1, keepdims=True)
    vs = 0.02

    ref_alpha = bnn.decoder_apply(params, local, feats)[..., 0] * vs
    ref = np.asarray(jnp.sum(ref_alpha * tw, axis=-1))

    out = np.asarray(fused_corner_decode(params, local, feats, tw, vs,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_fused_decode_with_pretrained(pretrained_tcnn_path, rng):
    from bnv_fusion_tpu.checkpoint import load_pretrained

    params = jax.tree.map(jnp.asarray, load_pretrained(pretrained_tcnn_path))
    n = 2048
    local = jnp.asarray((rng.rand(n, 8, 3) * 2 - 1).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 8, 8).astype(np.float32))
    tw = jnp.asarray(rng.rand(n, 8).astype(np.float32))
    ref_alpha = bnn.decoder_apply(params, local, feats)[..., 0] * 0.01
    ref = np.asarray(jnp.sum(ref_alpha * tw, axis=-1))
    out = np.asarray(fused_corner_decode(params, local, feats, tw, 0.01,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)
