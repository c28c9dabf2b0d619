"""Stage-2 replacement candidate: bitonic MERGE of 8 sorted streams vs lax.sort.

The cell-sort fuse's stage 2 sorts [K, 8*u_cell] corner keys + payloads
(~5-8 ms/frame, the largest remaining per-frame cost at the round-3
operating point).  But the 8 corner streams are each SORTED: with constant
per-stream offsets (cell_u + pattern_j . (s0, s1, 1)) every stream is the
strictly-increasing unique-cell sequence plus a constant.  (Degenerate
cells — points exactly on a grid plane — are handled by integer plane
weights {0,1,2} instead of collapsed keys; see fusion.py.)  Merging 8
sorted streams needs only a 3-level bitonic MERGE network:
17+18+19 = 54 compare-exchange rounds at 2^19 rows vs the full sort's
~190 — and each round is a fusable elementwise min/max/select.

This measures, on the real chip, at the bench operating point
(K=16 frames x 8 streams x 65536 rows, 6 operands = key + 4 packed
payload words + count):
  - lax.sort (the current stage 2)
  - 3-level bitonic merge (jnp rounds)
and validates merged keys == sorted keys, per-key payload sums equal.

Usage: python profiling/probe_bitonic_merge.py [K] [u_cell] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bitonic_merge_pairs(key, payloads):
    """Merge adjacent sorted pairs along the stream axis.

    key: [..., P, 2, L] — P independent merges, each of two sorted length-L
    streams.  Returns ([..., P, 2L], payloads likewise) sorted per P row.
    """
    import jax.numpy as jnp

    *lead, p, two, el = key.shape
    assert two == 2
    n = 2 * el
    # concat(A, reversed(B)) is bitonic
    key = jnp.concatenate([key[..., 0, :], key[..., 1, ::-1]], axis=-1)
    payloads = [jnp.concatenate([q[..., 0, :], q[..., 1, ::-1]], axis=-1)
                for q in payloads]
    d = n // 2
    while d >= 1:
        sh = tuple(lead) + (p, n // (2 * d), 2, d)
        k = key.reshape(sh)
        lo, hi = k[..., 0, :], k[..., 1, :]
        swap = lo > hi
        key = jnp.stack([jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)],
                        axis=-2).reshape(tuple(lead) + (p, n))
        out = []
        for q in payloads:
            r = q.reshape(sh)
            qlo, qhi = r[..., 0, :], r[..., 1, :]
            out.append(jnp.stack([jnp.where(swap, qhi, qlo),
                                  jnp.where(swap, qlo, qhi)],
                                 axis=-2).reshape(tuple(lead) + (p, n)))
        payloads = out
        d //= 2
    return key, payloads


def merge8(key, payloads):
    """key [K, 8, L] (each stream sorted) -> [K, 8L] merged, with payloads."""
    kf, s, el = key.shape
    assert s == 8
    k = key.reshape(kf, 4, 2, el)
    ps = [q.reshape(kf, 4, 2, el) for q in payloads]
    k, ps = bitonic_merge_pairs(k, ps)                  # [K, 4, 2L]
    k = k.reshape(kf, 2, 2, 2 * el)
    ps = [q.reshape(kf, 2, 2, 2 * el) for q in ps]
    k, ps = bitonic_merge_pairs(k, ps)                  # [K, 2, 4L]
    k = k.reshape(kf, 1, 2, 4 * el)
    ps = [q.reshape(kf, 1, 2, 4 * el) for q in ps]
    k, ps = bitonic_merge_pairs(k, ps)                  # [K, 1, 8L]
    return k[:, 0], [q[:, 0] for q in ps]


def main():
    kf = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    u_cell = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    # realistic strides for the lounge at voxel 0.01 (n_xyz ~ 600^3)
    s0, s1 = 600 * 600, 600
    deltas = np.array([dz + dy * s1 + dx * s0
                       for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                      np.int32)                          # 8 corner offsets

    # sorted unique-ish base cell keys per frame (the real distribution is
    # surface cells: clustered runs with gaps)
    base = np.sort(rng.randint(0, 600 ** 3 - s0 - s1 - 2,
                               size=(kf, u_cell)).astype(np.int32), axis=1)
    keys8 = base[:, None, :] + deltas[None, :, None]     # [K, 8, L]
    cnt8 = rng.randint(1, 60, size=keys8.shape).astype(np.int32)
    pay8 = [rng.randint(-2 ** 30, 2 ** 30, size=keys8.shape).astype(np.int32)
            for _ in range(4)]                           # packed bf16 pairs

    dk = jnp.asarray(keys8)
    dc = jnp.asarray(cnt8)
    dp = [jnp.asarray(p) for p in pay8]

    m2 = 8 * u_cell

    @jax.jit
    def run_sort(k, c, p0, p1, p2, p3):
        ops = jax.vmap(lambda kk, cc, *pp: jax.lax.sort(
            (kk,) + pp + (cc,), num_keys=1))(
                k.reshape(kf, m2), c.reshape(kf, m2),
                *[q.reshape(kf, m2) for q in (p0, p1, p2, p3)])
        chk = sum(jnp.sum(o.astype(jnp.int64)) for o in ops[1:])
        return jnp.sum(ops[0].astype(jnp.int64) *
                       jnp.arange(m2, dtype=jnp.int64)[None, :]) + chk

    @jax.jit
    def run_merge(k, c, p0, p1, p2, p3):
        mk, mp = merge8(k, [c, p0, p1, p2, p3])
        chk = sum(jnp.sum(o.astype(jnp.int64)) for o in mp)
        return jnp.sum(mk.astype(jnp.int64) *
                       jnp.arange(m2, dtype=jnp.int64)[None, :]) + chk

    # correctness first (keys identical => checksums must match; per-key
    # payload sums checked on host for one frame)
    a = int(np.asarray(run_sort(dk, dc, *dp)))
    b = int(np.asarray(run_merge(dk, dc, *dp)))
    mk, mp = jax.jit(lambda k, c, *p: merge8(k, [c] + list(p)))(dk, dc, *dp)
    mk0 = np.asarray(mk[0])
    ref0 = np.sort(keys8[0].reshape(-1))
    assert np.array_equal(mk0, ref0), "merged keys != sorted keys"
    # per-key count sums (frame 0)
    import collections
    want = collections.Counter()
    for j in range(8):
        for i in range(u_cell):
            want[keys8[0, j, i]] += cnt8[0, j, i]
    got = collections.Counter()
    mc0 = np.asarray(mp[0][0])
    for kk, cc in zip(mk0, mc0):
        got[kk] += cc
    assert want == got, "per-key count sums differ"
    print(f"correct (checksum sort={a} merge={b}, equal={a == b})")

    for name, fn in (("lax.sort", run_sort), ("bitonic-merge", run_merge)):
        t0 = time.time()
        _ = int(np.asarray(fn(dk, dc, *dp)))
        t_first = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            _ = int(np.asarray(fn(dk, dc, *dp)))
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"{name:14s}: first {t_first:6.2f}s, median {med * 1e3:7.2f} ms "
              f"= {med * 1e3 / kf:6.3f} ms/frame  (K={kf}, m2={m2})")


if __name__ == "__main__":
    main()
