"""Op-level attribution of the optimize iteration (VERDICT r4 item 1, part 2).

The tuned e2e schedule spends 48 x ~71 ms in Adam iterations — the largest
e2e phase (3.4 s of 6.2).  probe_decode_ops proved the MESH decode chain is
~85% random-gather cost; this probe attributes the optimize iteration the
same way, by timing progressively larger prefixes of the production step
(optimize.make_optimize_step structure, parallel_chunks semantics) at the
bench operating point: 5000 rays / 5 chunks of 1000, n_fine=12, n_coarse=4,
4 iterations per launch, real post-fusion table + TSDF prior.

Variants (cumulative prefixes + subtractive):
  rays_only   build_rays_from_frame x4 iters
  prep        + hierarchical sampling + corner lookup + weight/delta gathers
  fwd         + feature gather + decoder MLP + blend + loss (no grad)
  grad        + backward (sparse cotangent rows)
  full        + count_optim bump + grad scatter + Adam update  (the product)
  full_nodelta   full with sdf_delta=None
  full_seq       full with sequential (scan) chunks instead of vmapped

Usage: python profiling/probe_optim_ops.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RAYS = 5000
SPLITS = 1000
N_FINE, N_COARSE = 12, 4
ITERS_PER_LAUNCH = 4
N_TIMED = 12   # launches per variant (= 48 iterations)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import fusion, optimize as optmod, render, tsdf
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

    table = nm.table
    sdf_delta = tsdf.prepare_sdf_delta(
        nm.tsdf_vol, nm.tsdf_voxel_size, nm.truncated_dist,
        nm.sdf_delta_weight)
    vs, min_pts = nm.voxel_size, nm.min_pts_in_grid
    tu, td, rmax = nm.truncated_units, nm.truncated_dist, nm.ray_max_dist
    bound_min = jnp.asarray(nm.bound_min)
    n_xyz = jnp.asarray(np.asarray(nm.n_xyz, np.int32))
    mparams = nm.params
    n_chunks = N_RAYS // SPLITS
    opt = optax.adam(2e-3)

    depth = jnp.asarray(frames[0]["depth"].astype(np.float32))
    depths = jnp.stack([jnp.asarray(frames[i]["depth"].astype(np.float32))
                        for i in range(ITERS_PER_LAUNCH)])
    T_wcs = jnp.stack([jnp.asarray(frames[i]["T_wc"].astype(np.float32))
                       for i in range(ITERS_PER_LAUNCH)])
    intrs = jnp.stack([jnp.asarray(frames[i]["intr_mat"].astype(np.float32))
                       for i in range(ITERS_PER_LAUNCH)])
    cap, fdim = table.features.shape

    def make_variant(depth_of=True, prep_of=True, fwd=True, grad=True,
                     tail=True, delta=True, parallel=True,
                     bump=None, scatter=None, adam=None):
        sd = sdf_delta if delta else None

        def one_iter(state, inp):
            depth, T_wc, intr, key = inp
            features, weights, opt_state = state
            k_rays, k_chunks = jax.random.split(key)
            rays = optmod.build_rays_from_frame(k_rays, depth, T_wc, intr,
                                                rmax, N_RAYS)
            if not prep_of:
                chk = (jnp.sum(rays.gt_pts) + jnp.sum(rays.uv)
                       + jnp.sum(rays.neighbor_pts) * 1e-6)
                return (features, weights, opt_state), chk

            def reshape(x):
                return x.reshape((n_chunks, SPLITS) + x.shape[1:])

            xs = ((reshape(rays.uv), reshape(rays.gt_pts),
                   reshape(rays.mask), reshape(rays.neighbor_pts),
                   reshape(rays.neighbor_masks)),
                  jax.random.split(k_chunks, n_chunks))

            def chunk_body(w, inp):
                cd, k = inp
                chunk = render.Rays(uv=cd[0], gt_pts=cd[1], mask=cd[2],
                                    neighbor_pts=cd[3], neighbor_masks=cd[4],
                                    T_wc=rays.T_wc, intr=rays.intr)
                t = table.replace(weights=w)
                prep, pts, cam_loc = render.prepare_render(
                    t, chunk, k, bound_min, vs, tu, td, rmax, sd, n_xyz,
                    n_fine=N_FINE, n_coarse=N_COARSE)
                if not fwd:
                    chk = (jnp.sum(prep.w) + jnp.sum(prep.tw)
                           + jnp.sum(prep.slots)
                           + (0.0 if prep.delta is None
                              else jnp.sum(prep.delta)))
                    return w, (chk, jnp.zeros((), jnp.int32),
                               jnp.zeros((SPLITS * (N_FINE + N_COARSE) * 8,
                                          fdim)))
                gfeats = features[prep.slots]

                def tail_fn(gf):
                    return render.eval_render_loss(
                        gf, prep, mparams, chunk, pts, cam_loc, vs,
                        min_pts, td)

                if grad:
                    loss, g_rows = jax.value_and_grad(tail_fn)(gfeats)
                else:
                    loss = tail_fn(gfeats)
                    g_rows = jnp.zeros_like(gfeats)
                if bump if bump is not None else tail:
                    w = fusion.bump_optim_weights(
                        table.replace(weights=w), prep.corners).weights
                gidx = jnp.where(prep.found, prep.slots, cap)
                if grad and not tail:
                    # DCE guard: unconsumed cotangents would erase the
                    # entire backward from the timed program
                    loss = loss + jnp.sum(jnp.abs(g_rows)) * 1e-6
                return w, (loss, gidx, g_rows)

            if parallel:
                def one(inp):
                    return chunk_body(weights, inp)
                w_all, ys = jax.vmap(one)(xs)
                weights = weights + jnp.sum(w_all - weights[None], axis=0)
            else:
                weights, ys = jax.lax.scan(chunk_body, weights, xs)
            losses, gidx, g_rows = ys
            do_scatter = (scatter if scatter is not None else tail) and fwd
            do_adam = (adam if adam is not None else tail) and fwd
            if do_scatter:
                grads = jnp.zeros((cap, fdim), jnp.float32).at[
                    gidx.reshape(-1)].add(g_rows.reshape(-1, fdim),
                                          mode="drop")
                if do_adam:
                    updates, opt_state = opt.update(grads, opt_state,
                                                    features)
                    features = optax.apply_updates(features, updates)
                else:
                    # DCE guard for the scatter-only variant
                    features = features + 0.0 * grads[:features.shape[0]]
            return (features, weights, opt_state), jnp.sum(losses)

        @jax.jit
        def launch(features, weights, opt_state, depths, T_wcs, intrs, key,
                   acc):
            keys = jax.random.split(key, ITERS_PER_LAUNCH)
            state, chks = jax.lax.scan(
                one_iter, (features, weights, opt_state),
                (depths, T_wcs, intrs, keys))
            features, weights, opt_state = state
            # DCE guard: consume the mutated state
            acc = (acc + jnp.sum(chks)
                   + jnp.sum(jnp.abs(features[0])) * 1e-6
                   + jnp.sum(weights[:8]) * 1e-6)
            return features, weights, opt_state, acc

        return launch

    ladder = os.environ.get("BNV_PROBE_LADDER", "")
    if ladder == "seq":
        variants = [
            ("fwd_seq", make_variant(grad=False, tail=False,
                                     parallel=False)),
            ("grad_seq", make_variant(tail=False, parallel=False)),
            ("gradbump_seq", make_variant(tail=False, bump=True,
                                          parallel=False)),
            ("gradscat_seq", make_variant(tail=False, bump=True,
                                          scatter=True, parallel=False)),
            ("full_seq", make_variant(parallel=False)),
        ]
    else:
        variants = [
            ("rays_only", make_variant(prep_of=False)),
            ("prep", make_variant(fwd=False)),
            ("fwd", make_variant(grad=False, tail=False)),
            ("grad", make_variant(tail=False)),
            ("full", make_variant()),
            ("full_nodelta", make_variant(delta=False)),
            ("full_seq", make_variant(parallel=False)),
        ]

    opt_state0 = opt.init(table.features)
    for name, fn in variants:
        feats = table.features
        w = table.weights
        ost = opt_state0
        acc = jnp.zeros(())
        feats, w, ost, acc = fn(feats, w, ost, depths, T_wcs, intrs,
                                jax.random.key(0), acc)
        _ = np.asarray(acc)  # compile + warm
        t0 = time.time()
        for i in range(N_TIMED):
            feats, w, ost, acc = fn(feats, w, ost, depths, T_wcs, intrs,
                                    jax.random.key(i), acc)
        chk = float(np.asarray(acc))
        dt = (time.time() - t0) / (N_TIMED * ITERS_PER_LAUNCH) * 1000
        print(f"{name:14s} {dt:7.2f} ms/iter  chk {chk:.2f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
