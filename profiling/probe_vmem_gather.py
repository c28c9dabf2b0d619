"""Two questions for the kernel strategy on this runtime:

1. empty pallas_call fixed overhead (suspected ~3.5-4 ms/call)
2. does Mosaic lower a dynamic VMEM gather (depth[idx]) and how fast —
   the TSDF prior update is gather-bound (8.8 ms/frame via XLA HBM gather).

Usage: python profiling/probe_vmem_gather.py [n_idx]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22  # 4M gathers

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    h, w = 480, 640
    rng = np.random.RandomState(0)
    depth = rng.rand(h * w).astype(np.float32)
    idx = rng.randint(0, h * w, size=n).astype(np.int32)
    depth_d = jnp.asarray(depth)
    idx_d = jnp.asarray(idx)

    scan_reps = 8

    def scanned(fn):
        @jax.jit
        def run(depth, idx):
            def body(c, _):
                return c + fn(depth, idx), None
            s, _ = jax.lax.scan(body, jnp.zeros(()), None, length=scan_reps)
            return s
        return run

    def timeit(name, fn):
        try:
            t0 = time.time()
            r = np.asarray(fn(depth_d, idx_d))
            c = time.time() - t0
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = np.asarray(fn(depth_d, idx_d))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:14s} {med*1000/scan_reps:7.2f} ms/rep  "
              f"(compile {c:.0f}s, check {float(r):.4e})", flush=True)

    # 0) empty kernel — the fixed per-call overhead
    def empty_kernel(out_ref):
        out_ref[...] = jnp.ones((8, 128), jnp.float32)

    def empty(depth, idx):
        r = pl.pallas_call(
            empty_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )()
        return r[0, 0]

    # 1) XLA baseline gather
    def xla_gather(depth, idx):
        return jnp.sum(depth[idx])

    # 2) Pallas VMEM gather: depth resident in VMEM, idx streamed.
    # Block rule: dims[-2] of every block must be 8-divisible or equal the
    # array dim, so depth rides as (2400, 128) whole-array and idx as
    # (1, 1, tile) blocks of a (1, n) array lifted to (1, 1, n).
    tile = 2048
    G = n // tile
    hw = h * w

    def gather_kernel(mode, depth_ref, idx_ref, out_ref):
        ids = idx_ref[0]                     # (1, tile) int32
        if mode == "flat":
            flat = depth_ref[...].reshape(1, hw)
            vals = flat[0, ids[0]]           # dynamic VMEM gather (1-D)
        elif mode == "take":
            flat = depth_ref[...].reshape(hw)
            vals = jnp.take(flat, ids[0], axis=0)
        elif mode == "take2d":
            flat = depth_ref[...].reshape(1, hw)
            vals = jnp.take_along_axis(flat, ids, axis=1)
        elif mode == "take2step":
            # Mosaic: "Only 2D gather is supported" — row gather then
            # column gather, both rank-2 take_along_axis
            d2 = depth_ref[...]                       # (2400, 128)
            rows = jnp.broadcast_to((ids[0] // 128)[:, None],
                                    (ids.shape[1], 128))
            picked = jnp.take_along_axis(d2, rows, axis=0)   # (tile, 128)
            cols = (ids[0] % 128)[:, None]
            vals = jnp.take_along_axis(picked, cols, axis=1)  # (tile, 1)
        out_ref[0, 0, 0] = jnp.sum(vals)

    def vmem(mode):
        kern = partial(gather_kernel, mode)

        def run(depth, idx):
            r = pl.pallas_call(
                kern,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((2400, 128), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, tile), lambda g: (0, 0, g),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((G, 1, 1), jnp.float32),
            )(depth.reshape(2400, 128), idx.reshape(1, 1, n))
            return jnp.sum(r)
        return run

    print(f"n={n} table={h*w}")
    timeit("empty", empty)
    timeit("xla", xla_gather)
    for mode in ("take2step",):
        timeit(f"vmem {mode}", vmem(mode))


if __name__ == "__main__":
    sys.exit(main())
