"""Open-addressing table on the real TPU: unrolled probe sweep vs while_loop.

The round-1 finding was that lax.while_loop probing "compiles/runs
pathologically" on the tunneled runtime; table.py now defaults to a static
12-round double-hash sweep on TPU.  This measures both (compile + run) at a
realistic batch size so RESULTS.md can carry numbers.

Usage: python profiling/probe_hash_table.py [n_keys] [capacity]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 19

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import table as htbl

    rng = np.random.RandomState(0)
    keys = rng.randint(0, 200, size=(n, 3)).astype(np.int32)
    valid = jnp.ones((n,), bool)
    keys_d = jnp.asarray(keys)

    for unroll in (True, False):
        name = "unrolled" if unroll else "while_loop"

        @jax.jit
        def ins(t, k):
            t2, slots, ok = htbl.insert(t, k, valid, unroll=unroll)
            return t2, jnp.sum(ok) + jnp.sum(slots[:64])

        @jax.jit
        def look(t, k):
            slots, found = htbl.lookup(t, k, unroll=unroll)
            return jnp.sum(found) + jnp.sum(slots[:64])

        t = htbl.create_table(cap, 8)
        t0 = time.time()
        t, chk = ins(t, keys_d)
        chk = float(np.asarray(chk))
        c_ins = time.time() - t0
        ts = []
        for _ in range(4):
            t2 = htbl.create_table(cap, 8)
            t0 = time.time()
            t2, chk2 = ins(t2, keys_d)
            _ = np.asarray(chk2)
            ts.append(time.time() - t0)
        t0 = time.time()
        r = np.asarray(look(t, keys_d))
        c_look = time.time() - t0
        ts2 = []
        for _ in range(4):
            t0 = time.time()
            r = np.asarray(look(t, keys_d))
            ts2.append(time.time() - t0)
        print(f"{name:10s} insert {sorted(ts)[1]*1000:8.1f} ms "
              f"(compile+1st {c_ins:.1f}s)  lookup {sorted(ts2)[1]*1000:8.1f} ms "
              f"(compile+1st {c_look:.1f}s)  check {float(r):.3e}",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
