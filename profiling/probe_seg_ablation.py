"""Ablate the seg-reduce kernel's stages to find the hot part on v5e.

Variants (cumulative):
  stream     — read tiles, trivial op, aligned block write
  scan       — + 11-round segmented scan (sums + flags)
  compact    — + prefix ranks + 11-round butterfly compaction
  transpose  — + channel pad + transpose
  full       — + dynamic-offset DMA (the real kernel)
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

    from bnv_fusion_tpu.kernels.seg_reduce import (_shift_left, _shift_right,
                                                   seg_reduce_sorted)

    fdim = 8
    sent = 1 << 26
    rng = np.random.RandomState(0)
    keys = np.sort(rng.randint(0, sent // 2, size=m)).astype(np.int32)
    vals = rng.randn(fdim, m).astype(np.float32)
    cnts = rng.randint(1, 50, size=(1, m)).astype(np.int32)
    keys_d = jnp.asarray(keys)[None]
    vals_d = jnp.asarray(vals)[None]
    cnts_d = jnp.asarray(cnts)[None]
    G = m // tile

    def body(mode, keys_ref, cnts_ref, vals_ref, out_ref, stage_ref, smem,
             sem):
        g = pl.program_id(1)
        t = tile

        @pl.when(g == 0)
        def _():
            smem[0] = 0

        k = keys_ref[...]
        ci = cnts_ref[0]
        vf = vals_ref[0]
        if mode == "stream":
            stage_ref[...] = jnp.broadcast_to(
                (jnp.sum(vf, axis=0, keepdims=True)
                 + k.astype(jnp.float32)).T, (t, 128))
            out_ref[...] = stage_ref[...]
            return
        kprev = _shift_right(k, 1, -1)
        boundary = (k != kprev)
        s_f, s_i = vf, ci
        flag = boundary.astype(jnp.int32)
        d = 1
        while d < t:
            nb = (flag == 0)
            s_f = s_f + jnp.where(nb, _shift_right(s_f, d, 0.0), 0.0)
            s_i = s_i + jnp.where(nb, _shift_right(s_i, d, 0), 0)
            flag = flag | _shift_right(flag, d, 0)
            d *= 2
        if mode == "scan":
            stage_ref[...] = jnp.broadcast_to(
                (jnp.sum(s_f, axis=0, keepdims=True)
                 + s_i.astype(jnp.float32)).T, (t, 128))
            out_ref[...] = stage_ref[...]
            return
        valid = k < sent
        knext = _shift_left(k, 1, sent)
        is_end = valid & (knext != k)
        e = is_end.astype(jnp.int32)
        p = e
        d = 1
        while d < t:
            p = p + _shift_right(p, d, 0)
            d *= 2
        n_ends = jnp.max(p)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        a = jnp.where(is_end, lane - (p - 1), 0)
        x = jnp.concatenate(
            [k, s_i, jax.lax.bitcast_convert_type(s_f, jnp.int32)], axis=0)
        kbit, d = 0, 1
        while d < t:
            cand_x = _shift_left(x, d, 0)
            cand_a = _shift_left(a, d, 0)
            take = ((cand_a >> kbit) & 1) == 1
            moved = ((a >> kbit) & 1) == 1
            x = jnp.where(take, cand_x, jnp.where(moved, 0, x))
            a = jnp.where(take, cand_a, jnp.where(moved, 0, a))
            kbit += 1
            d *= 2
        if mode == "compact":
            stage_ref[...] = jnp.broadcast_to(
                (jnp.sum(x, axis=0, keepdims=True) + n_ends).astype(
                    jnp.float32).T, (t, 128))
            out_ref[...] = stage_ref[...]
            return
        ch = x.shape[0]
        x = jnp.concatenate([x, jnp.zeros((128 - ch, t), jnp.int32)], axis=0)
        stage_ref[...] = x.T.astype(jnp.float32)
        out_ref[...] = stage_ref[...] + n_ends
        return

    def make(mode):
        kern = partial(body, mode)
        return pl.pallas_call(
            kern,
            grid=(1, G),
            in_specs=[
                pl.BlockSpec((1, tile), lambda b, g: (b, g)),
                pl.BlockSpec((1, 1, tile), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, fdim, tile), lambda b, g: (b, 0, g)),
            ],
            out_specs=pl.BlockSpec((tile, 128), lambda b, g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile, 128), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )

    scan_reps = 8

    def run_fn(mode):
        f = make(mode)

        @jax.jit
        def run(keys, cnts, vals):
            def body2(c, _):
                r = f(keys, cnts, vals)
                return c + r[::997, 0].sum() + r[-1, 5], None
            s, _ = jax.lax.scan(body2, jnp.zeros(()), None, length=scan_reps)
            return s
        return run

    def full_fn():
        @jax.jit
        def run(keys, cnts, vals):
            def body2(c, _):
                ku, _k2, cu, su, ns = seg_reduce_sorted(
                    keys, cnts, vals, u=m // 4, sent=sent, tile=tile)
                return c + jnp.sum(jnp.abs(su[:, ::97])) + ns[0], None
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
        print(f"{name:10s} {med*1000/scan_reps:7.2f} ms/rep  "
              f"(compile {c:.0f}s, check {float(r):.3e})", flush=True)

    print(f"M={m} tile={tile} G={G}")
    for mode in ["stream", "scan", "compact", "transpose"]:
        timeit(mode, run_fn(mode))
    timeit("full", full_fn())


if __name__ == "__main__":
    sys.exit(main())
