"""A/B the Pallas seg-reduce kernel vs the XLA cumsum+compaction-sort path
at fuse stage-2 production shapes on the real chip.

Usage: python profiling/probe_seg_kernel.py [M] [u] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    u = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    tile = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu.kernels.seg_reduce import seg_reduce_sorted

    fdim = 8
    sent = 1 << 26
    rng = np.random.RandomState(0)
    n_valid = int(m * 0.75)
    ks = np.sort(rng.choice(sent // 2, size=n_valid // 6,
                            replace=False)).astype(np.int32)
    flat = np.repeat(ks, rng.randint(1, 11, size=ks.shape[0]))[:n_valid]
    keys = np.full((m,), sent, np.int32)
    keys[:len(flat)] = np.sort(flat)
    vals = np.zeros((fdim, m), np.float32)
    vals[:, :len(flat)] = rng.randn(fdim, len(flat)).astype(np.float32)
    cnts = np.zeros((1, m), np.int32)
    cnts[:, :len(flat)] = rng.randint(1, 50, size=(1, len(flat)))

    keys_d = jnp.asarray(keys)[None]
    vals_d = jnp.asarray(vals)[None]
    cnts_d = jnp.asarray(cnts)[None]

    scan_reps = 8

    def scanned(fn):
        """Run fn scan_reps times inside ONE launch (subtracts the tunneled
        runtime's ~30 ms per-dispatch overhead from the comparison)."""
        @jax.jit
        def run(keys, cnts, vals):
            def body(c, _):
                return c + fn(keys, cnts, vals), None
            s, _ = jax.lax.scan(body, jnp.zeros(()), None, length=scan_reps)
            return s
        return run

    def kernel_path(keys, cnts, vals):
        ku, _, cu, su, ns = seg_reduce_sorted(keys, cnts, vals, u=u,
                                              sent=sent, tile=tile)
        return (jnp.sum(jnp.abs(su)) + jnp.sum(cu) + jnp.sum(ku[0, :16])
                + ns[0])

    def xla_path(keys, cnts, vals):
        # the current fusion.py seg2 machinery (mean-centered cumsum +
        # end-pos compaction sort + gathers)
        ck_s = keys[0]
        f2_s = vals[0].T
        c2_s = cnts[0, 0]
        prev2 = jnp.concatenate([jnp.full((1,), -1, ck_s.dtype), ck_s[:-1]])
        b2 = ck_s != prev2
        ev2 = ck_s < sent
        mean2 = jnp.mean(f2_s, axis=0, keepdims=True)
        cum2 = jnp.cumsum(f2_s - mean2, axis=0)
        ccum2 = jnp.cumsum(c2_s)
        nxt2 = jnp.concatenate([b2[1:], jnp.ones((1,), bool)])
        is_end2 = nxt2 & ev2
        n_unique = jnp.sum(is_end2).astype(jnp.int32)
        idx2 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
        end2 = jax.lax.sort(jnp.where(is_end2, idx2, m))[:u]
        end2 = jnp.minimum(end2, m - 1)
        pend2 = jnp.concatenate([jnp.full((1,), -1, end2.dtype), end2[:-1]])
        flat_u = ck_s[end2]
        seg_n = (end2 - pend2).astype(jnp.float32)
        clo = jnp.where(pend2 >= 0, ccum2[jnp.maximum(pend2, 0)], 0)
        cnt_u = (ccum2[end2] - clo).astype(jnp.float32)
        flo = jnp.where((pend2 >= 0)[:, None],
                        cum2[jnp.maximum(pend2, 0)], 0.0)
        sum_u = cum2[end2] - flo + mean2 * seg_n[:, None]
        return (jnp.sum(jnp.abs(sum_u)) + jnp.sum(cnt_u)
                + jnp.sum(flat_u[:16]) + n_unique)

    def timeit(name, fn):
        fn = scanned(fn)
        t0 = time.time()
        r = np.asarray(fn(keys_d, cnts_d, vals_d))
        print(f"{name} compile+first: {time.time()-t0:.1f}s  check={r:.6e}",
              flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = np.asarray(fn(keys_d, cnts_d, vals_d))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med*1000/scan_reps:.2f} ms/rep "
              f"(launch {med*1000:.1f} ms, check {r:.6e})", flush=True)
        return med

    print(f"M={m} u={u} fdim={fdim} valid={len(flat)} "
          f"uniq={len(np.unique(flat))}")
    timeit("xla   ", xla_path)
    timeit("kernel", kernel_path)
    # correctness spot check vs each other
    ku, _, cu, su, ns = jax.jit(
        lambda k, c, v: seg_reduce_sorted(k, c, v, u=u, sent=sent,
                                          tile=tile))(
            keys_d, cnts_d, vals_d)
    nsh = int(np.asarray(ns)[0])
    print(f"kernel n_seg={nsh} (expect {len(np.unique(flat))})")
    uniq, inv = np.unique(flat, return_inverse=True)
    ref_sum = np.zeros((len(uniq), fdim), np.float64)
    np.add.at(ref_sum, inv, vals[:, :len(flat)].T)
    ref_cnt = np.zeros((len(uniq),), np.int64)
    np.add.at(ref_cnt, inv, cnts[0, :len(flat)])
    nn = min(nsh, u, len(uniq))
    ok_k = np.array_equal(np.asarray(ku)[0, :nn], uniq[:nn])
    ok_c = np.array_equal(np.asarray(cu)[0, :nn, 0], ref_cnt[:nn])
    err = np.abs(np.asarray(su)[0, :nn] - ref_sum[:nn]).max()
    print(f"keys ok={ok_k} cnts ok={ok_c} max|sum err|={err:.2e}")


if __name__ == "__main__":
    sys.exit(main())
