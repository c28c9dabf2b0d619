"""Checkpoint reader + converter tests (both reference formats)."""

import numpy as np
import pytest

from bnv_fusion_tpu import checkpoint as ckpt


def test_load_torch_checkpoint_tensors(pretrained_torch_path):
    ck = ckpt.load_torch_checkpoint(pretrained_torch_path)
    sd = ck["state_dict"]
    assert sd["pointnet_backbone.conv1.weight"].shape == (128, 6, 1)
    assert sd["nerf.geo_layer0.weight"].shape == (256, 17)
    assert sd["nerf.fc_alpha.weight"].shape == (1, 256)


def test_convert_torch_folds_batchnorm(pretrained_torch_path):
    sd = ckpt.load_torch_checkpoint(pretrained_torch_path)["state_dict"]
    params = ckpt.convert_pointnet_torch(sd)
    enc, dec = params["encoder"], params["decoder"]
    assert enc["w0"].shape == (6, 128) and enc["w_out"].shape == (128, 8)
    assert dec["w0"].shape == (17, 256) and dec["w_out"].shape == (256, 1)


def test_tcnn_blob_sizes(pretrained_tcnn_path):
    sd = ckpt.load_torch_checkpoint(pretrained_tcnn_path)["state_dict"]
    assert sd["pointnet_backbone.model.params"].shape == (10240,)
    assert sd["nerf.model.params"].shape == (11264,)


def test_tcnn_unpack_layout(pretrained_tcnn_path):
    sd = ckpt.load_torch_checkpoint(pretrained_tcnn_path)["state_dict"]
    params = ckpt.convert_pointnet_tcnn(sd)
    enc, dec = params["encoder"], params["decoder"]
    assert enc["w0"].shape == (6, 64) and enc["w_out"].shape == (64, 8)
    assert dec["w0"].shape == (17, 64) and dec["w_out"].shape == (64, 1)
    # layers must be non-degenerate (trained weights, not padding garbage)
    for p in (enc, dec):
        for k in ("w0", "w1", "w2", "w_out"):
            assert np.abs(p[k]).max() > 1e-3
            assert np.std(p[k]) > 1e-4


def test_unpack_tcnn_mlp_synthetic_roundtrip():
    """Pack a known MLP into the tcnn layout and unpack it back."""
    rng = np.random.RandomState(1)
    w_in = rng.randn(64, 16).astype(np.float32)   # [out, padded_in]
    w_h1 = rng.randn(64, 64).astype(np.float32)
    w_h2 = rng.randn(64, 64).astype(np.float32)
    w_out = rng.randn(16, 64).astype(np.float32)
    blob = np.concatenate([m.ravel() for m in (w_in, w_h1, w_h2, w_out)])
    p = ckpt.unpack_tcnn_mlp(blob, n_in=6, n_out=8)
    np.testing.assert_allclose(p["w0"], w_in[:, :6].T)
    np.testing.assert_allclose(p["b0"], w_in[:, 6:].sum(1))
    np.testing.assert_allclose(p["w1"], w_h1.T)
    np.testing.assert_allclose(p["w_out"], w_out[:8].T)


def test_save_load_state_roundtrip(tmp_path, rng):
    tree = {"a": {"b": rng.rand(3, 4).astype(np.float32)},
            "c": np.arange(5, dtype=np.int32)}
    path = str(tmp_path / "state.npz")
    ckpt.save_state(path, tree)
    back = ckpt.load_state(path)
    np.testing.assert_allclose(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["c"], tree["c"])


def test_load_pretrained_autodetect(pretrained_tcnn_path, pretrained_torch_path):
    p1 = ckpt.load_pretrained(pretrained_tcnn_path)
    p2 = ckpt.load_pretrained(pretrained_torch_path)
    assert p1["encoder"]["w0"].shape == (6, 64)
    assert p2["encoder"]["w0"].shape == (6, 128)
