"""Stage-2 restructure candidate: ONE flat sort over all K frames vs the
current per-frame vmapped sort.

The production batched fuse (fusion._cellsort_reduce_batched) pays TWO
sorts after the cell reduction: (1) the per-frame stage-2 corner sort,
jax.vmap(lax.sort) over [K, 8*u_cell] rows x 6 operands (~5-8 ms/frame,
the largest remaining per-frame cost), and (2) the cross-frame merge sort
over [K*u] rows in fuse_frames_merged (~1.1 ms/frame).  Both exist to
produce voxel-contiguous streams; a restructure could replace both with
ONE stable flat sort of all K*8*u_cell rows keyed by corner voxel id
(frame id packed into the count payload's high bits; stability keeps
frame-major order within a voxel segment, so the two-key segmented-reduce
kernel recovers the per-(voxel, frame) partials the min-pts semantics
need).

Whether that pays is purely a question of how lax.sort scales: bitonic
work is O(n log^2 n), so a single 2^23-row sort does ~1.6x the
compare-exchange work of 16 independent 2^19-row sorts — but the vmapped
sort was measured well above the flat sort's per-row cost (2.4M x 9
operands = 8 ms standalone vs ~5 ms/frame for 524k x 6 vmapped), so the
batched network may be leaving efficiency on the floor.  This measures,
on the real chip, at the bench shapes (K=16, u_cell=65536, 6 operands =
key + count + 4 packed bf16-pair words):

  - vmapped per-frame sort   [K, 524288]  (the current stage 2)
  - flat stable sort         [8388608]    (the candidate)

Usage: python profiling/probe_flat_sort.py [K] [u_cell] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    kf = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    u_cell = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    s0, s1 = 600 * 600, 600                       # lounge voxel-0.01 strides
    deltas = np.array([dz + dy * s1 + dx * s0
                       for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                      np.int32)
    base = np.sort(rng.randint(0, 600 ** 3 - s0 - s1 - 2,
                               size=(kf, u_cell)).astype(np.int32), axis=1)
    keys = (base[:, None, :] + deltas[None, :, None]).reshape(kf, -1)
    cnt = rng.randint(1, 60, size=keys.shape).astype(np.int32)
    pays = [rng.randint(-2 ** 30, 2 ** 30, size=keys.shape).astype(np.int32)
            for _ in range(4)]

    m2 = keys.shape[1]
    dk = jnp.asarray(keys)
    dc = jnp.asarray(cnt)
    dp = [jnp.asarray(p) for p in pays]

    # checksums are int32 ON PURPOSE (x64 is not enabled, so int64 would
    # silently downcast anyway — ADVICE round 3): wraparound is fine for a
    # DCE-proofing checksum, it only needs to consume every operand
    @jax.jit
    def run_vmapped(k, c, p0, p1, p2, p3):
        ops = jax.vmap(lambda kk, cc, *pp: jax.lax.sort(
            (kk,) + pp + (cc,), num_keys=1))(k, c, p0, p1, p2, p3)
        chk = sum(jnp.sum(o.astype(jnp.int32)) for o in ops[1:])
        return jnp.sum(ops[0].astype(jnp.int32) *
                       jnp.arange(m2, dtype=jnp.int32)[None, :]) + chk

    @jax.jit
    def run_flat(k, c, p0, p1, p2, p3):
        # is_stable=True: the candidate restructure NEEDS stability (it
        # preserves frame-major order inside a voxel segment for the
        # two-key seg-reduce).  The originally recorded 4.85 ms/frame was
        # measured with the default unstable sort, i.e. a LOWER bound on
        # the true candidate — the dead-end conclusion is conservative
        # either way (ADVICE round 3).
        ops = jax.lax.sort(
            (k.reshape(-1),) + tuple(q.reshape(-1) for q in (p0, p1, p2, p3))
            + (c.reshape(-1),), num_keys=1, is_stable=True)
        chk = sum(jnp.sum(o.astype(jnp.int32)) for o in ops[1:])
        return jnp.sum(ops[0].astype(jnp.int32) *
                       jnp.arange(kf * m2, dtype=jnp.int32)) + chk

    for name, fn in (("vmapped-per-frame", run_vmapped), ("flat", run_flat)):
        t0 = time.time()
        _ = int(np.asarray(fn(dk, dc, *dp)))
        print(f"{name}: first call {time.time() - t0:.1f} s", flush=True)
        t0 = time.time()
        for _ in range(reps):
            _ = int(np.asarray(fn(dk, dc, *dp)))
        dt = (time.time() - t0) / reps * 1e3
        print(f"{name}: {dt:.2f} ms total, {dt / kf:.2f} ms/frame "
              f"({kf}x{m2} rows, 6 ops)", flush=True)


if __name__ == "__main__":
    main()
