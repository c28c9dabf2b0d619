"""Fused feature-major MLP: the whole ReLU stack in one Pallas kernel.

The PointNet encoder / SDF decoder are tiny MLPs (6/17 -> 64 -> 64 -> 64 ->
8/1, reference tcnn_config.json FullyFusedMLP n_neurons=64) applied to
millions of rows.  Under XLA each layer's [M, 64] activation round-trips
HBM, and the narrow feature dimension pads to the 128-lane tile — most of
the traffic is padding.  This kernel keeps activations FEATURE-MAJOR
([d, M]: features on sublanes, rows on lanes — both dense) so one grid
step loads a [din, BM] slab, runs every layer in VMEM via the MXU
(weights are a few KB and stay resident), and writes [dout, BM] once:
traffic collapses to the input+output slabs.

Inference-only (the optimization loss keeps XLA autodiff); mirrors
bnv_fusion_tpu.nn.mlp_apply numerics (f32 accumulation).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), x.dtype)
    out[: x.shape[0], : x.shape[1]] = x
    return out


def pack_params(params: Dict[str, jnp.ndarray], sublane: int = 8):
    """Stack an mlp_apply-style {w0,b0,...,w_out,b_out} dict into padded
    feature-major operands (transposed weights, 2-D biases)."""
    n_hidden = sum(1 for k in params if k.startswith("w") and k != "w_out")
    ws, bs, dims = [], [], []
    for i in range(n_hidden):
        ws.append(np.asarray(params[f"w{i}"], np.float32))
        bs.append(np.asarray(params[f"b{i}"], np.float32))
    ws.append(np.asarray(params["w_out"], np.float32))
    bs.append(np.asarray(params["b_out"], np.float32))

    def rnd(n):
        return max(sublane, int(np.ceil(n / sublane)) * sublane)

    packed_w, packed_b = [], []
    for w, b in zip(ws, bs):
        din, dout = w.shape
        pw = _pad_to(w.T, rnd(dout), rnd(din))       # [dout_p, din_p]
        pb = _pad_to(b.reshape(-1, 1), rnd(dout), 1)
        packed_w.append(jnp.asarray(pw))
        packed_b.append(jnp.asarray(pb))
        dims.append((din, dout))
    return packed_w, packed_b, dims


def _mlp_kernel(x_ref, *refs):
    # refs = (w0, b0, w1, b1, ..., out_ref)
    out_ref = refs[-1]
    wb = refs[:-1]
    h = x_ref[:]                                     # [din_p, BM]
    n_layers = len(wb) // 2
    for i in range(n_layers):
        w = wb[2 * i][:]                             # [dout_p, din_p]
        b = wb[2 * i + 1][:]                         # [dout_p, 1]
        h = (
            jax.lax.dot_general(
                w, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            + b
        )
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[:] = h


def fused_mlp_feature_major(packed_w, packed_b, x_t: jnp.ndarray,
                            dout: int, block_m: int = 2048,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Apply the packed MLP to feature-major input [din_p, M] -> [dout_p, M].

    M must be a multiple of ``block_m`` (pad rows with anything; the MLP is
    row-independent).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    din_p, m = x_t.shape
    assert m % block_m == 0, (m, block_m)
    dout_p = packed_w[-1].shape[0]
    wb = []
    for w, b in zip(packed_w, packed_b):
        wb.extend([w, b])

    grid = (m // block_m,)
    in_specs = [pl.BlockSpec((din_p, block_m), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for op in wb:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((dout_p, block_m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dout_p, m), jnp.float32),
        interpret=interpret,
    )(x_t, *wb)
    return out


class FusedMLP:
    """Packed, jit-friendly wrapper: FusedMLP(params)(x [..., din]) matches
    nn.mlp_apply(params, x) (row-major API; transposes at the edges)."""

    def __init__(self, params: Dict[str, jnp.ndarray], block_m: int = 2048):
        self.packed_w, self.packed_b, self.dims = pack_params(params)
        self.din = self.dims[0][0]
        self.dout = self.dims[-1][1]
        self.din_p = self.packed_w[0].shape[1]
        self.block_m = block_m

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        m = int(np.prod(shape[:-1]))
        mp = int(np.ceil(m / self.block_m)) * self.block_m
        xt = jnp.zeros((self.din_p, mp), jnp.float32)
        xt = xt.at[: self.din, :m].set(
            x.reshape(m, shape[-1]).T.astype(jnp.float32))
        out = fused_mlp_feature_major(self.packed_w, self.packed_b, xt,
                                      self.dout, self.block_m)
        return out[: self.dout, :m].T.reshape(shape[:-1] + (self.dout,))
