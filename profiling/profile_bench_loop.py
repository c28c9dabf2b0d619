"""Where does bench.py's wall-clock go?  Splits the integrate_batch loop into
host-prep (numpy stack), transfer (device_put), dispatch, and sync.

Usage: python profiling/profile_bench_loop.py [voxel] [K] [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    voxel_size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        f"model.voxel_size={voxel_size}",
        f"dataset.num_images={n_frames}",
        "dataset.img_res=[480,640]",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    nm = NeuralMap(ds.dimensions, cfg, params)
    frames = [ds[i] for i in range(len(ds))]

    # donation disabled: this harness re-uses table/tsdf buffers across
    # variants, which donated launches would invalidate
    body = nm._fuse_step_body()
    from functools import partial

    @jax.jit
    def step(table, tsdf_vol, params, depths, T_wcs, intrs,
             bound_min, bound_max):
        def one(carry, frame):
            table, tsdf_vol = carry
            depth, T_wc, intr = frame
            table, tsdf_vol, stats = body(table, tsdf_vol, params, depth,
                                          T_wc, intr, bound_min, bound_max)
            return (table, tsdf_vol), stats
        (table, tsdf_vol), stats = jax.lax.scan(
            one, (table, tsdf_vol), (depths, T_wcs, intrs))
        return table, tsdf_vol, stats

    dev = jax.devices()[0]
    sum_jit = jax.jit(lambda a: jnp.sum(a))

    # host-prep all batches
    t0 = time.time()
    batches = []
    for i in range(0, len(frames) - k + 1, k):
        bs = frames[i:i + k]
        batches.append((
            np.stack([np.asarray(b["depth"], np.float32) for b in bs]),
            np.stack([np.asarray(b["T_wc"], np.float32) for b in bs]),
            np.stack([np.asarray(b["intr_mat"], np.float32) for b in bs]),
        ))
    t_prep = time.time() - t0
    print(f"host prep {len(batches)} batches: {t_prep*1000:.1f} ms total")

    # transfer cost: device_put one batch, synced
    d0, dT, di = batches[0]
    for name, arr in [("depth", d0), ("pose", dT)]:
        x = jax.device_put(arr, dev)
        _ = np.asarray(sum_jit(x))
        ts = []
        for _ in range(3):
            t0 = time.time()
            x = jax.device_put(arr, dev)
            _ = np.asarray(sum_jit(x))
            ts.append(time.time() - t0)
        print(f"device_put+sum {name} {arr.nbytes/1e6:.1f} MB: "
              f"{sorted(ts)[1]*1000:.1f} ms")

    # warmup compile
    table, tsdf_vol = nm.table, nm.tsdf_vol
    table, tsdf_vol, _ = step(table, tsdf_vol, nm.params,
                              jnp.asarray(d0), jnp.asarray(dT),
                              jnp.asarray(di), nm.bound_min, nm.bound_max)
    _ = np.asarray(table.weights[:1])

    # variant A: everything pre-staged on device, timed loop = dispatch+sync.
    # jnp.asarray (NOT device_put-committed) keeps the sharding identical to
    # the warmup call, so the compiled program is reused.
    dev_batches = [(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
                   for a, b, c in batches[1:]]
    _ = np.asarray(dev_batches[-1][0][0, 0, 0])
    t0 = time.time()
    for a, b, c in dev_batches:
        table, tsdf_vol, _ = step(table, tsdf_vol, nm.params, a, b, c,
                                  nm.bound_min, nm.bound_max)
    _ = np.asarray(table.weights[:1])
    dt = time.time() - t0
    nfr = k * len(dev_batches)
    print(f"A pre-staged:      {dt*1000/nfr:6.1f} ms/frame  "
          f"({nfr/dt:.2f} fps)")

    # variant B: staging inside the loop (what bench.py does today)
    table, tsdf_vol = nm.table, nm.tsdf_vol
    t0 = time.time()
    for a, b, c in batches[1:]:
        table, tsdf_vol, _ = step(table, tsdf_vol, nm.params,
                                  jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(c), nm.bound_min, nm.bound_max)
    _ = np.asarray(table.weights[:1])
    dt = time.time() - t0
    print(f"B in-loop staging: {dt*1000/nfr:6.1f} ms/frame  "
          f"({nfr/dt:.2f} fps)")

    # variant D: B + per-launch stats fetch (what integrate_batch does)
    table, tsdf_vol = nm.table, nm.tsdf_vol
    t0 = time.time()
    for a, b, c in batches[1:]:
        table, tsdf_vol, stats = step(table, tsdf_vol, nm.params,
                                      jnp.asarray(a), jnp.asarray(b),
                                      jnp.asarray(c), nm.bound_min,
                                      nm.bound_max)
        _ = np.asarray(stats.n_avg_pts)
    _ = np.asarray(table.weights[:1])
    dt = time.time() - t0
    print(f"D B+stats-fetch:   {dt*1000/nfr:6.1f} ms/frame  "
          f"({nfr/dt:.2f} fps)")

    # variant C: in-loop staging via explicit async device_put one batch ahead
    table, tsdf_vol = nm.table, nm.tsdf_vol
    t0 = time.time()
    staged = [jax.device_put(x, dev) for x in batches[1]]
    for i in range(1, len(batches)):
        nxt = batches[i + 1] if i + 1 < len(batches) else None
        a, b, c = staged
        if nxt is not None:
            staged = [jax.device_put(x, dev) for x in nxt]
        table, tsdf_vol, _ = step(table, tsdf_vol, nm.params, a, b, c,
                                  nm.bound_min, nm.bound_max)
    _ = np.asarray(table.weights[:1])
    dt = time.time() - t0
    print(f"C prefetch-1:      {dt*1000/nfr:6.1f} ms/frame  "
          f"({nfr/dt:.2f} fps)")


if __name__ == "__main__":
    sys.exit(main())
