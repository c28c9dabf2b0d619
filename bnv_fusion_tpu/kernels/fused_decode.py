"""Pallas TPU kernel: fused SDF corner decode.

The decode hot path (meshing / inference) evaluates, per sample point:
positional encoding of 8 corner offsets, concat with the gathered corner
latents, a 3-hidden-layer MLP, and a trilinear blend (reference
tiny-cuda-nn's fused MLP role, src/models/fusion/modules.py).  Under plain
XLA this materializes [N, 8, 17] and [N, 8, 64] intermediates in HBM between
ops; this kernel keeps a tile of points resident in VMEM.

Layout notes (Mosaic): trailing dims pad to 128 lanes, so 3-D blocks like
[T, 8, 3] would inflate 42x and blow the VMEM budget — inputs are therefore
passed 2-D ([T, 24] offsets, [T, 8F] latents) and the kernel iterates the 8
corners with static lane slices, never reshaping across the lane dim.  The
output is 1-D with TILE=1024 blocks to match XLA's {0:T(1024)} layout.

The corner-latent gather stays in XLA (fast bulk gather); CPU tests run the
same kernel in interpret mode.

Measured on v5e (262k points, pretrained decoder): pallas 6.5 ms vs plain
XLA 3.5 ms — the decoder is small enough that XLA's automatic fusion already
wins, so the pipeline keeps the XLA path by default
(model.use_fused_decode_kernel=False) and this kernel remains a
correctness-tested scaffold for wider decoders.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

TILE = 1024  # output block; must match XLA 1-D layout tiling T(1024)


def _kernel(local_ref, feats_ref, tw_ref, w0_ref, b0_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, wo_ref, bo_ref, out_ref, *, voxel_size: float,
            feat_dims: int):
    tw = tw_ref[...]                                  # [T, 8]
    acc = jnp.zeros((TILE,), jnp.float32)
    for c in range(8):
        x = local_ref[:, 3 * c:3 * c + 3]             # [T, 3]
        fc = feats_ref[:, feat_dims * c:feat_dims * (c + 1)]
        pe = jnp.concatenate([x, jnp.sin(x), jnp.cos(x)], axis=-1)
        h = jnp.concatenate([pe, fc], axis=-1)        # [T, 9 + F]
        h = jnp.maximum(
            jnp.dot(h, w0_ref[...],
                    preferred_element_type=jnp.float32) + b0_ref[...], 0.0)
        h = jnp.maximum(
            jnp.dot(h, w1_ref[...],
                    preferred_element_type=jnp.float32) + b1_ref[...], 0.0)
        h = jnp.maximum(
            jnp.dot(h, w2_ref[...],
                    preferred_element_type=jnp.float32) + b2_ref[...], 0.0)
        alpha = (jnp.dot(h, wo_ref[...],
                         preferred_element_type=jnp.float32) +
                 bo_ref[...])[:, 0]                   # [T]
        acc = acc + alpha * voxel_size * tw[:, c]
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("voxel_size", "interpret"))
def fused_corner_decode(params: Dict[str, Any], local: jnp.ndarray,
                        feats: jnp.ndarray, tw: jnp.ndarray,
                        voxel_size: float,
                        interpret: bool = False) -> jnp.ndarray:
    """Blended SDF for corner data (local [N,8,3], feats [N,8,F], tw [N,8]);
    N must be a TILE multiple (callers pad).  Matches decoder_apply +
    trilinear blend semantics (num_pe_fns=1, 3 hidden layers)."""
    from jax.experimental import pallas as pl

    dec = params["decoder"]
    n = local.shape[0]
    if n % TILE:
        raise ValueError(f"point count {n} must be a multiple of TILE={TILE}")
    grid = (n // TILE,)
    f = feats.shape[-1]
    local2 = local.reshape(n, 24)
    feats2 = feats.reshape(n, 8 * f)

    def tile_spec(width):
        return pl.BlockSpec((TILE, width), lambda i: (i, 0))

    def full_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

    args = (local2, feats2, tw, dec["w0"], dec["b0"], dec["w1"], dec["b1"],
            dec["w2"], dec["b2"], dec["w_out"], dec["b_out"])
    in_specs = [tile_spec(24), tile_spec(8 * f), tile_spec(8)] + \
        [full_spec(a) for a in args[3:]]
    return pl.pallas_call(
        functools.partial(_kernel, voxel_size=voxel_size, feat_dims=f),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,)),
        interpret=interpret,
    )(*args)


def fused_decode_available(params: Dict[str, Any]) -> bool:
    """The kernel supports the tcnn topology: 3 hidden layers, 1-d output."""
    dec = params.get("decoder", {})
    return all(k in dec for k in
               ("w0", "w1", "w2", "w_out", "b0", "b1", "b2", "b_out")) and \
        "w3" not in dec
