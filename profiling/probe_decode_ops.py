"""Op-level attribution of the per-sample decode chain (VERDICT r4 item 1).

The decode chain (corner int math -> slot_map lookup -> feature gather ->
PE -> 17->64^3->1 MLP -> trilinear blend -> dense-prior sample) runs at
~0.37 us/point forward on v5e — ~0.3% of bf16 peak — and is ~70% of the
e2e wall (48 x 71 ms optimize iters + 0.87 s mesh decode).  Round-4 A/Bs
(kernel fusion, layout, batch size, fetch dtype) all lost; this probe
finds WHERE the time goes by subtractive variants of the exact mesh-phase
decode at the bench operating point, on the real post-fusion table and
the real mesh lattice points.

Variants (each a jitted closure, timed over the same staged batches):
  full_f32    the shipped decode (baseline; must reproduce ~0.37 us/pt)
  full_bf16   compute_dtype=bfloat16 for the MLP matmuls
  randslots   slot_map gather replaced by cheap pseudo-random int math
              (keeps the RANDOM feature gather) -> isolates the lookup
  seqslots    slots = iota (sequential feature gather) -> gather locality
  nogather    feats/weights constants (lookup kept) -> isolates the
              [8M, F] feature + weight gathers
  nope        sin/cos replaced by scaled copies (same 17-dim concat)
  nomlp       MLP replaced by a row sum (keeps PE + gathers + blend)
  nodelta     skip the dense-prior nearest sample
  skeleton    corner math + blend only (no lookup/gather/PE/MLP/delta)
  mlponly     bare mlp_apply on a pre-staged [8M, 17] activation, f32+bf16
  gatheronly  bare features[slots] gather + sum, random slots

Usage: python profiling/probe_decode_ops.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 1 << 18
N_TIMED = 27  # launches per variant (3 cycles over 9 real batches)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import fusion, mesh as mesh_mod, tables as tbl, tsdf
    from bnv_fusion_tpu import nn as bnn, voxel
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        "model.voxel_size=0.01",
        "dataset.num_images=48",
        "dataset.img_res=[480,640]",
        "dataset.stage_raw_depth=true",
    ])
    params = load_pretrained("/root/reference/pretrained/pointnet_tcnn.ckpt")
    ds = get_dataset(cfg, "val")
    frames = [ds[i] for i in range(len(ds))]
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(0, len(frames) - 8 + 1, 8):
        nm.integrate_batch(frames[i:i + 8])
    _ = np.asarray(nm.table.weights[:1])

    # the exact mesh-phase lattice (extract_mesh's point stream)
    keys, _, weights, hits, _ = tbl.active_entries(nm.table,
                                                   with_features=False)
    gate = weights >= nm.min_pts_in_grid
    active = keys[gate].astype(np.int32)
    points, corner_idx, cells = mesh_mod.build_sample_lattice(active, 2)
    coords = points.astype(np.float32) / 2.0
    print(f"lattice: {len(points)} pts over {len(active)} voxels "
          f"({(len(points) + BATCH - 1)//BATCH} batches of {BATCH})",
          flush=True)

    batches = []
    for s in range(0, len(points), BATCH):
        e = min(s + BATCH, len(points))
        b = np.zeros((BATCH, 3), np.float32)
        b[: e - s] = coords[s:e]
        batches.append(jnp.asarray(b))
    nb = len(batches)

    sdf_delta = tsdf.prepare_sdf_delta(
        nm.tsdf_vol, nm.tsdf_voxel_size, nm.truncated_dist,
        nm.sdf_delta_weight)
    table = nm.table
    feat_dims = table.feat_dims
    vs, min_pts, n_xyz = nm.voxel_size, nm.min_pts_in_grid, nm.n_xyz
    mparams = nm.params
    cap = table.capacity

    def make_decode(lookup_mode="real", gather=True, pe=True, mlp=True,
                    delta=True, compute_dtype=jnp.float32):
        @jax.jit
        def decode(features, table, sdf_delta, acc, coords):
            corners = voxel.corner_neighbors(coords)        # [M,8,3]
            tw = voxel.trilinear_weights(coords, corners)   # [M,8]
            local = voxel.local_offsets(coords, corners)    # [M,8,3]
            m = coords.shape[0]
            q = corners.reshape(m * 8, 3)
            if lookup_mode == "real":
                slots, found = tbl.lookup(table, q)
            elif lookup_mode == "rand":
                # same gather randomness, no slot_map read
                slots = (jax.lax.iota(jnp.uint32, m * 8)
                         * np.uint32(2654435761)) % np.uint32(cap)
                slots = slots.astype(jnp.int32)
                found = q[:, 0] >= 0
            else:  # "seq"
                slots = jax.lax.iota(jnp.int32, m * 8) % np.int32(cap)
                found = q[:, 0] >= 0
            if gather:
                feats = jnp.where(found[:, None], features[slots], 0.0)
                w = jnp.where(found, table.weights[slots], 0.0)
            else:
                feats = jnp.where(found[:, None], 0.1, 0.0)
                feats = jnp.broadcast_to(feats, (m * 8, feat_dims))
                w = jnp.where(found, 1.0 * min_pts, 0.0)
            feats = feats.reshape(m, 8, -1)
            w = w.reshape(m, 8)
            if pe:
                pe_x = bnn.positional_encoding(local, num_fns=1)
            else:
                pe_x = jnp.concatenate(
                    [local, local * 0.5, local * 0.25], axis=-1)
            geo_in = jnp.concatenate([pe_x, feats.astype(pe_x.dtype)],
                                     axis=-1)
            if mlp:
                alpha = bnn.mlp_apply(mparams["decoder"], geo_in,
                                      compute_dtype)[..., 0]
            else:
                alpha = jnp.sum(geo_in, axis=-1)
            sdf = jnp.sum(alpha * vs * tw, axis=-1)
            mask = jnp.min(w, axis=-1) >= min_pts
            sdf = jnp.where(mask, sdf, vs)
            if delta:
                d = fusion._sample_delta_nearest(sdf_delta, corners, n_xyz)
                sdf = sdf + jnp.sum(d * tw, axis=-1)
            return acc + jnp.sum(jnp.abs(sdf))

        return decode

    variants = [
        ("full_f32", make_decode()),
        ("full_bf16", make_decode(compute_dtype=jnp.bfloat16)),
        ("randslots", make_decode(lookup_mode="rand")),
        ("seqslots", make_decode(lookup_mode="seq")),
        ("nogather", make_decode(gather=False)),
        ("nope", make_decode(pe=False)),
        ("nomlp", make_decode(mlp=False)),
        ("nodelta", make_decode(delta=False)),
        ("skeleton", make_decode(lookup_mode="seq", gather=False, pe=False,
                                 mlp=False, delta=False)),
    ]

    results = {}
    for name, fn in variants:
        acc = jnp.zeros((), jnp.float32)
        acc = fn(table.features, table, sdf_delta, acc, batches[0])
        acc = fn(table.features, table, sdf_delta, acc, batches[1 % nb])
        _ = np.asarray(acc)  # compile + warm
        acc = jnp.zeros((), jnp.float32)
        t0 = time.time()
        for i in range(N_TIMED):
            acc = fn(table.features, table, sdf_delta, acc,
                     batches[i % nb])
        chk = float(np.asarray(acc))
        dt = time.time() - t0
        ms = dt / N_TIMED * 1000
        results[name] = ms
        print(f"{name:10s} {ms:7.2f} ms/batch  "
              f"{ms * 1000 / BATCH * 1000:6.0f} ns/pt  chk {chk:.1f}",
              flush=True)

    # bare-op floors ------------------------------------------------
    rows = BATCH * 8
    x_act = jnp.asarray(
        np.random.RandomState(0).randn(rows, 17).astype(np.float32))
    rslots = jnp.asarray(
        (np.random.RandomState(1).randint(0, cap, size=rows))
        .astype(np.int32))

    for name, dt_ in (("mlponly_f32", jnp.float32),
                      ("mlponly_bf16", jnp.bfloat16)):
        @jax.jit
        def mlponly(x, acc, _dt=dt_):
            return acc + jnp.sum(jnp.abs(
                bnn.mlp_apply(mparams["decoder"], x, _dt)))

        acc = jnp.zeros((), jnp.float32)
        _ = np.asarray(mlponly(x_act, acc))
        t0 = time.time()
        for _ in range(N_TIMED):
            acc = mlponly(x_act, acc)
        _ = np.asarray(acc)
        ms = (time.time() - t0) / N_TIMED * 1000
        print(f"{name:12s} {ms:7.2f} ms/batch ({rows} rows)", flush=True)

    @jax.jit
    def gatheronly(features, weights, slots, acc):
        f = features[slots]
        w = weights[slots]
        return acc + jnp.sum(jnp.abs(f)) + jnp.sum(w)

    acc = jnp.zeros((), jnp.float32)
    _ = np.asarray(gatheronly(table.features, table.weights, rslots, acc))
    t0 = time.time()
    for _ in range(N_TIMED):
        acc = gatheronly(table.features, table.weights, rslots, acc)
    _ = np.asarray(acc)
    ms = (time.time() - t0) / N_TIMED * 1000
    print(f"{'gatheronly':12s} {ms:7.2f} ms/batch ({rows} rows of "
          f"[{cap}, {feat_dims}])", flush=True)

    @jax.jit
    def slotmaponly(slot_map, flat, acc):
        return acc + jnp.sum(slot_map[flat])

    rflat = jnp.asarray(
        (np.random.RandomState(2).randint(0, table.slot_map.shape[0],
                                          size=rows)).astype(np.int32))
    acc = jnp.zeros((), jnp.int32)
    _ = np.asarray(slotmaponly(table.slot_map, rflat, acc))
    t0 = time.time()
    for _ in range(N_TIMED):
        acc = slotmaponly(table.slot_map, rflat, acc)
    _ = np.asarray(acc)
    ms = (time.time() - t0) / N_TIMED * 1000
    print(f"{'slotmaponly':12s} {ms:7.2f} ms/batch ({rows} of "
          f"[{table.slot_map.shape[0]}] int32)", flush=True)

    base = results.get("full_f32", 0.0)
    print("\nattribution (full_f32 minus variant):")
    for k, v in results.items():
        if k != "full_f32":
            print(f"  {k:10s} {base - v:+7.2f} ms")


if __name__ == "__main__":
    sys.exit(main())
