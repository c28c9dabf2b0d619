"""Gradient-scatter variants (probe_optim_ops follow-up).

The seq-ladder attribution: the optimize iteration's grad scatter —
ONE ``zeros[cap, F].at[gidx].add(g_rows)`` of 640k rows x 8 ch into
[2.1M, 8] f32 — costs 26.8 ms/iter, HALF the 54.8 ms iteration
(~82 ns/scalar; the backward itself is +0.8 ms, Adam +0.1).  This probe
measures drop-in alternatives at the exact operating point:

  baseline     zeros.at[gidx].add(rows, mode=drop), sentinel = cap
  nozeros      accumulate into a CARRIED buffer (donated) instead of fresh
               zeros — isolates the zeros+RMW materialization
  sorted       same scatter, indices pre-sorted inside the jit (sort cost
               included) — locality hypothesis
  segsum       jax.ops.segment_sum path
  sortreduce   lax.sort (key + 8 payload ch) + boundary cumsum-diff +
               scatter of UNIQUE rows only (the fusion pipeline's pattern)
  chan1        eight 1-channel scatters (lane-padding hypothesis)

Usage: python profiling/probe_grad_scatter.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAP = 2097152
FDIM = 8
ROWS = 5 * 1000 * 16 * 8   # chunks x rays x samples x corners = 640k
N_TIMED = 30


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # realistic index distribution: rays hit ~tens of thousands of distinct
    # voxels, 8 corners each, heavy duplication along rays
    rng = np.random.RandomState(0)
    uniq = rng.choice(CAP, size=60000, replace=False).astype(np.int32)
    gidx_np = uniq[rng.randint(0, len(uniq), size=ROWS)]
    gidx_np[rng.rand(ROWS) < 0.02] = CAP          # dropped sentinel rows
    gidx = jnp.asarray(gidx_np)
    rows = jnp.asarray(rng.randn(ROWS, FDIM).astype(np.float32))

    @jax.jit
    def baseline(gidx, rows, acc):
        g = jnp.zeros((CAP, FDIM), jnp.float32).at[gidx].add(
            rows, mode="drop")
        return acc + jnp.sum(jnp.abs(g[::65536]))

    @jax.jit
    def sorted_scatter(gidx, rows, acc):
        order = jnp.argsort(gidx)
        g = jnp.zeros((CAP, FDIM), jnp.float32).at[gidx[order]].add(
            rows[order], mode="drop")
        return acc + jnp.sum(jnp.abs(g[::65536]))

    @jax.jit
    def segsum(gidx, rows, acc):
        g = jax.ops.segment_sum(rows, gidx, num_segments=CAP + 1)
        return acc + jnp.sum(jnp.abs(g[:-1:65536]))

    UB = 131072  # compacted unique-row budget (~60k distinct in practice)

    @jax.jit
    def sortreduce(gidx, rows, acc):
        # the fusion pipeline's sort-reduce pattern (fusion._cellsort_reduce)
        # applied to gradient rows: sort by slot, per-channel cumsum,
        # windowed segment sums at compacted boundaries, ONE [UB]-row scatter
        ops = jax.lax.sort((gidx,) + tuple(rows[:, j] for j in range(FDIM)),
                           num_keys=1)
        k = ops[0]
        p = jnp.stack(ops[1:], axis=-1)
        csum = jnp.cumsum(p, axis=0)
        is_end = jnp.concatenate([k[1:] != k[:-1], jnp.ones((1,), bool)])
        is_end = is_end & (k < CAP)    # sentinel rows drop
        idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)[:, 0]
        endpos = jax.lax.sort(jnp.where(is_end, idx, ROWS))[:UB]
        valid = endpos < ROWS
        ec = jnp.minimum(endpos, ROWS - 1)
        keys_c = k[ec]
        prev = jnp.concatenate([jnp.full((1,), -1, ec.dtype), ec[:-1]])
        sums = csum[ec] - jnp.where((prev >= 0)[:, None],
                                    csum[jnp.maximum(prev, 0)], 0.0)
        g = jnp.zeros((CAP + 1, FDIM), jnp.float32).at[
            jnp.where(valid, keys_c, CAP)].add(sums, mode="drop")
        return acc + jnp.sum(jnp.abs(g[:-1:65536]))

    @jax.jit
    def chan1(gidx, rows, acc):
        outs = []
        for j in range(FDIM):
            outs.append(jnp.zeros((CAP,), jnp.float32).at[gidx].add(
                rows[:, j], mode="drop"))
        g = jnp.stack(outs, -1)
        return acc + jnp.sum(jnp.abs(g[::65536]))

    @jax.jit
    def carried(gidx, rows, buf, acc):
        buf = buf.at[gidx].add(rows, mode="drop")
        return buf, acc + jnp.sum(jnp.abs(buf[::65536]))

    def run(name, fn, *extra):
        acc = jnp.zeros(())
        out = fn(gidx, rows, *extra, acc)
        if isinstance(out, tuple):
            state, acc = out[:-1], out[-1]
        else:
            state, acc = extra, out
        _ = np.asarray(acc)
        acc = jnp.zeros(())
        t0 = time.time()
        for _ in range(N_TIMED):
            out = fn(gidx, rows, *state, acc)
            if isinstance(out, tuple):
                state, acc = out[:-1], out[-1]
            else:
                acc = out
        chk = float(np.asarray(acc))
        print(f"{name:12s} {(time.time()-t0)/N_TIMED*1000:7.2f} ms  "
              f"chk {chk:.1f}", flush=True)

    import os as _os
    only = _os.environ.get("BNV_SCATTER_ONLY", "").split(",")
    def want(n):
        return not only or only == [""] or n in only
    if want("baseline"):
        run("baseline", baseline)
    if want("sorted"):
        run("sorted", sorted_scatter)
    if want("segsum"):
        run("segsum", segsum)
    if want("chan1"):
        run("chan1", chan1)
    if want("carried"):
        buf = jnp.zeros((CAP, FDIM), jnp.float32)
        run("carried", jax.jit(carried, donate_argnums=(2,)), buf)
    if want("sortreduce"):
        run("sortreduce", sortreduce)


if __name__ == "__main__":
    sys.exit(main())
