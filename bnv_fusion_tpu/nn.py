"""Neural nets: PointNet local-shape encoder and the tiny SDF decoder MLP.

TPU-native replacements for the reference's networks:

* PointNetEncoder / tcnnPointNetEncoder
  (reference src/utils/pointnet_utils.py:228-294) — per-point MLP over
  (relative xyz, normal) 6-vectors.  Inference uses BatchNorm folded into the
  dense layers (eval mode), so both checkpoint flavors reduce to the same
  plain-MLP apply below.
* LocalNeRFModel / tcnnNeRFModel geo path
  (reference src/models/fusion/modules.py:136-176,249-253,534-662,923-971) —
  positional encoding of the local offset concat the 8-d voxel latent -> MLP
  -> normalized SDF.

Parameters are plain dicts of ``w``/``b`` arrays (``w`` stored [in, out]), as
produced by bnv_fusion_tpu.checkpoint converters.  All applies are pure
functions safe under jit/vmap/shard_map; matmuls run in the requested compute
dtype (bfloat16 on TPU by default for the MXU) with float32 accumulation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def mlp_apply(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Apply a ReLU MLP stored as {w0,b0,...,w_out,b_out} (no final ReLU)."""
    n_hidden = sum(1 for k in params if k.startswith("w") and k != "w_out")
    h = x.astype(compute_dtype)
    for i in range(n_hidden):
        w = params[f"w{i}"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        h = h + params[f"b{i}"]
        h = jnp.maximum(h, 0.0).astype(compute_dtype)
    out = jnp.dot(h, params["w_out"].astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    return out + params["b_out"]


def positional_encoding(x: jnp.ndarray, num_fns: int = 1,
                        include_input: bool = True,
                        log_sampling: bool = True) -> jnp.ndarray:
    """NeRF sin/cos encoding (reference src/models/fusion/modules.py:81-123).

    With the e2e config (num_encoding_fn_xyz=1) a 3-vector maps to 9 dims:
    [x, sin(x), cos(x)].
    """
    outs = [x] if include_input else []
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, num_fns - 1, num_fns)
    else:
        freqs = np.linspace(2.0 ** 0.0, 2.0 ** (num_fns - 1), num_fns)
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def encoder_apply(params: Dict[str, Any], pts6: jnp.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """PointNet per-point features: [..., 6] -> [..., feat_dims].

    Input layout matches reference encode_pointcloud
    (src/models/fusion/local_point_fusion.py:106-113): first three channels
    are the point's offset from the voxel corner normalized to [-1, 1] by the
    voxel size, last three the world-frame unit normal.
    """
    return mlp_apply(params["encoder"], pts6, compute_dtype)


def encoder_global_apply(params: Dict[str, Any], pts6: jnp.ndarray,
                         valid: jnp.ndarray | None = None,
                         compute_dtype=jnp.float32) -> jnp.ndarray:
    """Mean-pooled global feature over a point set: [B, N, 6] -> [B, F].

    Equivalent to forward(..., global_feats=True)
    (reference src/utils/pointnet_utils.py:259-263) with optional validity
    masking for padded point sets.
    """
    feats = mlp_apply(params["encoder"], pts6, compute_dtype)
    if valid is None:
        return jnp.mean(feats, axis=-2)
    v = valid[..., None].astype(feats.dtype)
    return jnp.sum(feats * v, axis=-2) / jnp.maximum(jnp.sum(v, axis=-2), 1.0)


def decoder_apply(params: Dict[str, Any], local_xyz: jnp.ndarray,
                  feats: jnp.ndarray, num_pe_fns: int = 1,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """SDF decoder: (local offset in voxel units [-1,1], latent) -> raw SDF.

    The raw output is normalized; callers multiply by voxel_size
    (reference src/models/sparse_volume.py:810-813).  Returns [..., 1].
    """
    pe = positional_encoding(local_xyz, num_fns=num_pe_fns)
    geo_in = jnp.concatenate([pe, feats.astype(pe.dtype)], axis=-1)
    return mlp_apply(params["decoder"], geo_in, compute_dtype)


# ---------------------------------------------------------------------------
# Trainable modules (pretraining path); BatchNorm kept explicit here.
# ---------------------------------------------------------------------------

def init_mlp(key, dims, scale: float = None) -> Dict[str, jnp.ndarray]:
    """He-init an MLP with layer dims [d0, d1, ..., dout]."""
    params = {}
    n = len(dims) - 1
    keys = jax.random.split(key, n)
    for i in range(n):
        s = scale or float(np.sqrt(2.0 / dims[i]))
        w = jax.random.normal(keys[i], (dims[i], dims[i + 1]), jnp.float32) * s
        name = f"w{i}" if i < n - 1 else "w_out"
        bname = f"b{i}" if i < n - 1 else "b_out"
        params[name] = w
        params[bname] = jnp.zeros((dims[i + 1],), jnp.float32)
    return params


def init_model(key, feat_dims: int = 8, hidden: int = 64, n_hidden: int = 3,
               num_pe_fns: int = 1) -> Dict[str, Any]:
    """Fresh (untrained) encoder+decoder params with the tcnn-sized topology."""
    k1, k2 = jax.random.split(key)
    pe_dims = 3 + 2 * 3 * num_pe_fns
    return {
        "encoder": init_mlp(k1, [6] + [hidden] * n_hidden + [feat_dims]),
        "decoder": init_mlp(k2, [pe_dims + feat_dims] + [hidden] * n_hidden + [1]),
    }
