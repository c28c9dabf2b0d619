"""Fused feature-major MLP kernel vs XLA mlp_apply at encoder scale."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu.checkpoint import load_pretrained
from bnv_fusion_tpu.kernels.fused_mlp import FusedMLP, fused_mlp_feature_major

params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
enc = params["encoder"]
m = 480 * 640 * 8
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(m, 6).astype(np.float32))
fused = FusedMLP(enc, block_m=4096)
xt = jnp.zeros((fused.din_p, m), jnp.float32).at[:6].set(x.T)

@jax.jit
def xla_apply(x):
    return jnp.sum(jnp.abs(bnn.mlp_apply(enc, x)))

@jax.jit
def fused_pre(xt):
    out = fused_mlp_feature_major(fused.packed_w, fused.packed_b, xt,
                                  fused.dout, fused.block_m,
                                  interpret=False)
    return jnp.sum(jnp.abs(out[:fused.dout]))

@jax.jit
def fused_with_transpose(x):
    return jnp.sum(jnp.abs(fused(x)))

for name, fn, arg in (("xla", xla_apply, x),
                      ("fused(pre-T)", fused_pre, xt),
                      ("fused(+T)", fused_with_transpose, x)):
    r = np.asarray(fn(arg))
    ts = []
    for _ in range(4):
        t0 = time.time(); r = np.asarray(fn(arg)); ts.append(time.time()-t0)
    print(f"{name:14s} {sorted(ts)[1]*1000:8.2f} ms  (check {float(r):.6e})")
