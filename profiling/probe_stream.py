"""Isolate the seg-reduce kernel's streaming floor: read vs write cost.

Variants:
  read+tiny   — read all input blocks, write (8,128) per tile
  read+full   — read all inputs, write (tile,128) per tile
  tinyread+full — read only keys, write (tile,128)
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    fdim = 8
    rng = np.random.RandomState(0)
    keys_d = jnp.asarray(np.sort(rng.randint(0, 1 << 25, size=m))
                         .astype(np.int32))[None]
    vals_d = jnp.asarray(rng.randn(fdim, m).astype(np.float32))[None]
    cnts_d = jnp.asarray(rng.randint(1, 50, size=(1, m)).astype(np.int32))[None]
    G = m // tile

    def body(mode, keys_ref, cnts_ref, vals_ref, out_ref):
        k = keys_ref[...]
        if mode == "tinyread+full":
            out_ref[...] = jnp.broadcast_to(
                k[:, :1].astype(jnp.float32), out_ref.shape)
            return
        ci = cnts_ref[0]
        vf = vals_ref[0]
        red = (jnp.sum(vf, axis=0, keepdims=True) + k.astype(jnp.float32)
               + ci.astype(jnp.float32))   # (1, tile)
        if mode == "read+tiny":
            out_ref[...] = jnp.broadcast_to(
                red[:, :128].reshape(1, 128), out_ref.shape)
        else:
            out_ref[...] = jnp.broadcast_to(red.T, out_ref.shape)

    def make(mode, par):
        kern = partial(body, mode)
        tiny = mode == "read+tiny"
        oshape = (G * 8, 128) if tiny else (m, 128)
        oblock = (8, 128) if tiny else (tile, 128)
        return pl.pallas_call(
            kern,
            grid=(1, G),
            in_specs=[
                pl.BlockSpec((1, tile), lambda b, g: (b, g)),
                pl.BlockSpec((1, 1, tile), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, fdim, tile), lambda b, g: (b, 0, g)),
            ],
            out_specs=pl.BlockSpec(oblock, lambda b, g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",
                                     "parallel" if par else "arbitrary")),
        )

    scan_reps = 8

    def run_fn(mode, par):
        f = make(mode, par)

        @jax.jit
        def run(keys, cnts, vals):
            def body2(c, _):
                r = f(keys, cnts, vals)
                return c + r[::997, 0].sum() + r[-1, 5], None
            s, _ = jax.lax.scan(body2, jnp.zeros(()), None, length=scan_reps)
            return s
        return run

    def timeit(name, fn):
        t0 = time.time()
        r = np.asarray(fn(keys_d, cnts_d, vals_d))
        c = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = np.asarray(fn(keys_d, cnts_d, vals_d))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:22s} {med*1000/scan_reps:7.2f} ms/rep  "
              f"(compile {c:.0f}s, check {float(r):.3e})", flush=True)

    print(f"M={m} tile={tile} G={G}")
    for mode in ["read+tiny", "read+full", "tinyread+full"]:
        for par in [False, True]:
            timeit(f"{mode}{' par' if par else ''}", run_fn(mode, par))


if __name__ == "__main__":
    sys.exit(main())
