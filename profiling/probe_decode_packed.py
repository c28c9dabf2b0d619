"""Restructured decode-chain variants (follow-up to probe_decode_ops.py).

probe_decode_ops attribution: the mesh-phase decode is ~85% random-gather
cost (lookup 18.9 + feats/weights 31.6 + delta 15.7 ms/batch), per-row
(~8-13 ns) and nearly table-size independent.  The attack is therefore
gather COUNT, not table size: collapse the four gathers into one.

Variants (same harness/operating point as probe_decode_ops):
  full_f32       the shipped decode (baseline)
  packed10       lookup + ONE [cap, 10] gather (feats, weight, per-slot
                 delta); delta folded per-voxel — exact for every value
                 that survives the min-pts mask (the mesh sentinel path
                 replaces masked values anyway, mesh.py:417-427)
  denseflat10    ONE [n_vox, 10] flat-indexed gather — no slot lookup at
                 all (dense-table-only: needs n_vox * 10 floats of HBM)
  denseflat10_bf16  same, bf16 payload (half the gather bytes)
  build costs    the one-off per-mesh-phase costs: per-slot delta
                 precompute (gather [cap] rows of the tsdf volume) and the
                 [n_vox, 10] scatter-build

Usage: python profiling/probe_decode_packed.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 1 << 18
N_TIMED = 27


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

    keys, _, weights, hits, _ = tbl.active_entries(nm.table,
                                                   with_features=False)
    gate = weights >= nm.min_pts_in_grid
    active = keys[gate].astype(np.int32)
    points, corner_idx, cells = mesh_mod.build_sample_lattice(active, 2)
    coords = points.astype(np.float32) / 2.0
    print(f"lattice: {len(points)} pts over {len(active)} voxels", flush=True)

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
    n_vox = int(table.slot_map.shape[0])
    nx = jnp.asarray(np.asarray(n_xyz, np.int32))

    def flat_of(q):
        return (q[:, 0] * (nx[1] * nx[2]) + q[:, 1] * nx[2]
                + q[:, 2]).astype(jnp.int32)

    # ---- one-off builds --------------------------------------------------
    @jax.jit
    def build_delta_slot(table, sdf_delta):
        """per-slot prior delta: nearest tsdf sample at each slot's voxel."""
        # slot -> voxel coord via the table's slot_flat inverse map
        inv = jnp.maximum(table.slot_flat, 0)
        k = jnp.stack([inv // (nx[1] * nx[2]), (inv // nx[2]) % nx[1],
                       inv % nx[2]], -1)
        d = fusion._sample_delta_nearest(
            sdf_delta, k[:, None, :].astype(jnp.float32), n_xyz)
        return d[:, 0]

    @jax.jit
    def build_packed(table, delta_slot):
        return jnp.concatenate(
            [table.features, table.weights[:, None], delta_slot[:, None]],
            axis=1)

    @jax.jit
    def build_denseflat(table, delta_slot, acc):
        packed = jnp.concatenate(
            [table.features, table.weights[:, None], delta_slot[:, None]],
            axis=1)
        dense = jnp.zeros((n_vox, feat_dims + 2), packed.dtype)
        sm = table.slot_map
        dense = dense.at[jnp.where(sm >= 0, jax.lax.iota(jnp.int32, n_vox),
                                   n_vox)].set(
            packed[jnp.maximum(sm, 0)], mode="drop")
        return dense, acc + jnp.sum(dense[0]) + jnp.sum(dense[-1])

    t0 = time.time()
    dslot = build_delta_slot(table, sdf_delta)
    _ = np.asarray(jnp.sum(dslot))
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(8):
        dslot = build_delta_slot(table, sdf_delta)
    _ = np.asarray(jnp.sum(dslot))
    print(f"build_delta_slot: {(time.time()-t0)/8*1000:.2f} ms "
          f"(first {t_compile:.1f}s)", flush=True)

    acc = jnp.zeros((), jnp.float32)
    dense, acc = build_denseflat(table, dslot, acc)
    _ = np.asarray(acc)
    t0 = time.time()
    for _ in range(8):
        dense, acc = build_denseflat(table, dslot, acc)
    _ = np.asarray(acc)
    print(f"build_denseflat [{n_vox},{feat_dims+2}]: "
          f"{(time.time()-t0)/8*1000:.2f} ms", flush=True)
    packed = build_packed(table, dslot)
    dense_bf16 = dense.astype(jnp.bfloat16)
    _ = np.asarray(jnp.sum(dense_bf16[:1].astype(jnp.float32)))

    # ---- decode variants -------------------------------------------------
    def skeleton_parts(coords):
        corners = voxel.corner_neighbors(coords)
        tw = voxel.trilinear_weights(coords, corners)
        local = voxel.local_offsets(coords, corners)
        m = coords.shape[0]
        q = corners.reshape(m * 8, 3).astype(jnp.int32)
        return corners, tw, local, m, q

    def tail(feats, w, d, local, tw, m, compute_dtype):
        feats = feats.reshape(m, 8, -1)
        w = w.reshape(m, 8)
        d = d.reshape(m, 8)
        pe_x = bnn.positional_encoding(local, num_fns=1)
        geo_in = jnp.concatenate([pe_x, feats.astype(pe_x.dtype)], axis=-1)
        alpha = bnn.mlp_apply(mparams["decoder"], geo_in, compute_dtype)[..., 0]
        sdf = jnp.sum(alpha * vs * tw, axis=-1)
        mask = jnp.min(w, axis=-1) >= min_pts
        sdf = jnp.where(mask, sdf, vs)
        sdf = sdf + jnp.sum(d * tw, axis=-1)
        return jnp.sum(jnp.abs(sdf))

    @jax.jit
    def full_f32(features, table, sdf_delta, acc, coords):
        corners, tw, local, m, q = skeleton_parts(coords)
        slots, found = tbl.lookup(table, q)
        feats = jnp.where(found[:, None], features[slots], 0.0)
        w = jnp.where(found, table.weights[slots], 0.0)
        feats = feats.reshape(m, 8, -1)
        w = w.reshape(m, 8)
        pe_x = bnn.positional_encoding(local, num_fns=1)
        geo_in = jnp.concatenate([pe_x, feats.astype(pe_x.dtype)], axis=-1)
        alpha = bnn.mlp_apply(mparams["decoder"], geo_in, jnp.float32)[..., 0]
        sdf = jnp.sum(alpha * vs * tw, axis=-1)
        mask = jnp.min(w, axis=-1) >= min_pts
        sdf = jnp.where(mask, sdf, vs)
        dlt = fusion._sample_delta_nearest(sdf_delta, corners, n_xyz)
        sdf = sdf + jnp.sum(dlt * tw, axis=-1)
        return acc + jnp.sum(jnp.abs(sdf))

    @jax.jit
    def packed10(packed, table, acc, coords):
        corners, tw, local, m, q = skeleton_parts(coords)
        slots, found = tbl.lookup(table, q)
        rows = jnp.where(found[:, None], packed[slots], 0.0)
        return acc + tail(rows[:, :feat_dims], rows[:, feat_dims],
                          rows[:, feat_dims + 1], local, tw, m, jnp.float32)

    def make_denseflat(arr_dtype):
        @jax.jit
        def denseflat(dense, acc, coords):
            corners, tw, local, m, q = skeleton_parts(coords)
            flat = flat_of(q)
            inb = jnp.all((q >= 0) & (q < nx), axis=-1)
            rows = dense[jnp.clip(flat, 0, n_vox - 1)].astype(jnp.float32)
            rows = jnp.where(inb[:, None], rows, 0.0)
            return acc + tail(rows[:, :feat_dims], rows[:, feat_dims],
                              rows[:, feat_dims + 1], local, tw, m,
                              jnp.float32)
        return denseflat

    denseflat_f32 = make_denseflat(jnp.float32)
    denseflat_b16 = make_denseflat(jnp.bfloat16)

    def run(name, fn, args):
        acc = jnp.zeros((), jnp.float32)
        acc = fn(*args, acc, batches[0])
        acc = fn(*args, acc, batches[1 % nb])
        _ = np.asarray(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.time()
        for i in range(N_TIMED):
            acc = fn(*args, acc, batches[i % nb])
        chk = float(np.asarray(acc))
        ms = (time.time() - t0) / N_TIMED * 1000
        print(f"{name:16s} {ms:7.2f} ms/batch  "
              f"{ms * 1e6 / BATCH:6.0f} ns/pt  chk {chk:.1f}", flush=True)
        return ms

    run("full_f32", full_f32, (table.features, table, sdf_delta))
    run("packed10", packed10, (packed, table))
    run("denseflat10", denseflat_f32, (dense,))
    run("denseflat10_b16", denseflat_b16, (dense_bf16,))


if __name__ == "__main__":
    sys.exit(main())
