"""Global-level fusion: render-loss optimization of the sparse volume latents.

Rebuilds NeuralMap.optimize (reference src/run_e2e.py:111-162): the stored
latents become free variables and are optimized with Adam against the
depth-rendering loss over randomly re-sampled frame rays, in microbatches of
``train_ray_splits`` rays with gradient accumulation (the reference's
per-chunk ``backward()`` + one ``optimizer.step()`` per frame batch).

TPU-first restructuring:
* ray building happens on device from the raw depth map (the reference
  reloads depth in DataLoader worker processes per iteration,
  src/datasets/fusion_inference_dataset.py:365-404),
* the chunk loop is a lax.scan with fixed shapes — one compiled program per
  run, zero retraces,
* the count_optim weight bump (reference sparse_volume.py:602-622) threads
  through the scan carry, replicating the reference's sequential semantics
  where earlier chunks unmask voxels for later ones.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from bnv_fusion_tpu import fusion, geometry, render
from bnv_fusion_tpu import tables as tbl


class OptimState(NamedTuple):
    features: jnp.ndarray   # [C, F] — the trainable latents
    weights: jnp.ndarray    # [C]   — decode-mask weights (bumped, not trained)
    opt_state: Any


def build_rays_from_frame(key, depth: jnp.ndarray, T_wc: jnp.ndarray,
                          intr: jnp.ndarray, max_depth: float,
                          n_rays: int, neighbor_kernel: int = 3,
                          pixel_ids: jnp.ndarray | None = None
                          ) -> render.Rays:
    """Device-side ray sampling from one raw depth frame.

    Equivalent to IterableInferenceDataset._sample_key_frame (reference
    src/datasets/fusion_inference_dataset.py:365-404): back-project, pick
    ``n_rays`` pixels without replacement, gather the neighbor window (the
    reference uses 3x3 in the online loop and 15x15 in the refiner datasets,
    fusion_dataset.py:349-374).
    """
    h, w = depth.shape
    mask = (depth > 0) & (depth < max_depth)
    xyz_cam = geometry.depth_to_xyz(depth, intr)
    xyz_w = geometry.transform_points(T_wc, xyz_cam.reshape(-1, 3))
    xyz_map_w = xyz_w.reshape(h, w, 3)

    if pixel_ids is None:
        idx = jax.random.choice(key, h * w, shape=(n_rays,), replace=False)
    else:
        idx = pixel_ids  # error-guided sampler supplies the pixels
    uv = jnp.stack([(idx % w).astype(jnp.float32),
                    (idx // w).astype(jnp.float32)], axis=-1)
    gt_pts = xyz_w[idx]
    ray_mask = mask.reshape(-1)[idx].astype(jnp.float32)
    neighbor_pts, neighbor_masks = geometry.gather_pixel_neighborhoods(
        xyz_map_w, mask, uv.astype(jnp.int32), neighbor_kernel)
    return render.Rays(
        uv=uv, gt_pts=gt_pts, mask=ray_mask,
        neighbor_pts=neighbor_pts,
        neighbor_masks=neighbor_masks.astype(jnp.float32),
        T_wc=T_wc, intr=intr)


def make_optimize_step(params: Dict[str, Any], voxel_size: float,
                       min_pts_in_grid: int, truncated_units: int,
                       truncated_dist: float, ray_max_dist: float,
                       n_rays: int, train_ray_splits: int,
                       lr: float = 1e-3, compute_dtype=jnp.float32,
                       neighbor_kernel: int = 3,
                       error_guided: bool = False,
                       decode_layout: str = "rows",
                       parallel_chunks: bool = False,
                       n_fine: int = 0, n_coarse: int = 0,
                       grad_scatter: str = "sortreduce"):
    """Build (optimizer, jitted step).

    step(state, table, frame depth/T_wc/intr, bound_min, n_xyz, sdf_delta,
    key) -> (state, loss): samples ``n_rays`` rays from the frame, scans over
    ``n_rays // train_ray_splits`` chunks accumulating latent gradients and
    weight bumps, then applies one Adam update (reference run_e2e.py:119-156).

    With ``error_guided`` (model.error_guided_sampling; rebuilds the
    reference's SampleManager, src/datasets/sampler.py:7-94, which the
    reference imports but never enables) the step takes the frame's patch
    error map as an extra trailing argument, draws half the rays from an
    error-weighted multinomial via sampler.sample_pixels, and returns the
    refreshed map: (state, loss, error_map).
    """
    if n_rays % train_ray_splits:
        raise ValueError("n_rays must be a multiple of train_ray_splits")
    n_chunks = n_rays // train_ray_splits
    opt = optax.adam(lr)

    def step(state: OptimState, table: tbl.AnyTable,
             depth: jnp.ndarray, T_wc: jnp.ndarray, intr: jnp.ndarray,
             bound_min: jnp.ndarray, n_xyz: jnp.ndarray,
             sdf_delta: jnp.ndarray | None, key,
             error_map: jnp.ndarray | None = None,
             lr_scale: jnp.ndarray | float = 1.0):
        k_rays, k_chunks = jax.random.split(key)
        pixel_ids = None
        if error_guided:
            from bnv_fusion_tpu import sampler
            pixel_ids = sampler.sample_pixels(
                k_rays, error_map, depth.shape, n_rays)
        rays = build_rays_from_frame(k_rays, depth, T_wc, intr,
                                     ray_max_dist, n_rays,
                                     neighbor_kernel=neighbor_kernel,
                                     pixel_ids=pixel_ids)

        def reshape(x):
            return x.reshape((n_chunks, train_ray_splits) + x.shape[1:])

        chunked = render.Rays(
            uv=reshape(rays.uv), gt_pts=reshape(rays.gt_pts),
            mask=reshape(rays.mask), neighbor_pts=reshape(rays.neighbor_pts),
            neighbor_masks=reshape(rays.neighbor_masks),
            T_wc=rays.T_wc, intr=rays.intr)
        keys = jax.random.split(k_chunks, n_chunks)
        cap = state.features.shape[0]

        def scan_body(weights, inp):
            chunk_data, k = inp
            chunk = render.Rays(
                uv=chunk_data[0], gt_pts=chunk_data[1], mask=chunk_data[2],
                neighbor_pts=chunk_data[3], neighbor_masks=chunk_data[4],
                T_wc=rays.T_wc, intr=rays.intr)
            t = table.replace(weights=weights)
            # feature-INDEPENDENT prep, then differentiate only w.r.t. the
            # gathered rows: the backward yields sparse cotangents instead
            # of a dense [capacity, F] gradient per chunk (12 ms/chunk of
            # dense accumulation on v5e — the loop's largest cost; one
            # scatter-add applies all chunks' cotangents after the scan)
            prep, pts, cam_loc = render.prepare_render(
                t, chunk, k, bound_min, voxel_size, truncated_units,
                truncated_dist, ray_max_dist, sdf_delta, n_xyz,
                n_fine=n_fine, n_coarse=n_coarse)
            gfeats = state.features[prep.slots]

            def tail(gf):
                return render.eval_render_loss(
                    gf, prep, params, chunk, pts, cam_loc, voxel_size,
                    min_pts_in_grid, truncated_dist, compute_dtype,
                    per_ray=error_guided)

            if error_guided:
                (loss, ray_err), g_rows = jax.value_and_grad(
                    tail, has_aux=True)(gfeats)
            else:
                loss, g_rows = jax.value_and_grad(tail)(gfeats)
                ray_err = None
            # count_optim: +1 on voxels touched by this chunk's samples
            # (reusing prep's lookup — the table keys don't change during
            # optimization, so decode_prepare's slots are exact here)
            weights = fusion.bump_optim_weights(
                t, prep.corners, slots=prep.slots, found=prep.found).weights
            gidx = jnp.where(prep.found, prep.slots, cap)
            ys = ((loss, ray_err, gidx, g_rows) if error_guided
                  else (loss, gidx, g_rows))
            return weights, ys

        xs = ((chunked.uv, chunked.gt_pts, chunked.mask,
               chunked.neighbor_pts, chunked.neighbor_masks), keys)
        if parallel_chunks:
            # all chunks run against the ITERATION-START weights.  The only
            # deviation from the reference's sequential schedule: a bump can
            # no longer unmask a voxel for a LATER chunk of the SAME
            # iteration (it still lands before the next iteration); the
            # accumulated weights themselves are exactly sequential.
            # model.parallel_ray_chunks opts in for chunk-level parallelism.
            def one(inp):
                return scan_body(state.weights, inp)
            w_all, ys = jax.vmap(one)(xs)
            # per-chunk bumps are independent of the weight values (lookup
            # only reads keys), so summing the per-chunk deltas reproduces
            # the sequential accumulation exactly
            weights = state.weights + jnp.sum(w_all - state.weights[None],
                                              axis=0)
        else:
            weights, ys = jax.lax.scan(scan_body, state.weights, xs)
        if error_guided:
            losses, ray_errs, gidx, g_rows = ys
        else:
            losses, gidx, g_rows = ys
        fdim = state.features.shape[1]
        # sort-reduce the sparse cotangents to unique rows before the
        # scatter: the plain 640k-row scatter-add measured 26.8 ms/iter —
        # HALF the tuned iteration — vs 13.7 sort-reduced
        # (probe_grad_scatter.py round 5; model.grad_scatter opts out)
        grads = fusion.scatter_add_rows(
            gidx.reshape(-1), g_rows.reshape(-1, fdim), cap,
            method=grad_scatter)

        updates, opt_state = opt.update(grads, state.opt_state, state.features)
        # per-iteration lr schedule hook: Adam's direction is lr-independent,
        # so scaling the update equals running adam(lr * lr_scale) exactly
        # (trainer.optim_lr_schedule; scale 1.0 multiplies exactly to u)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        features = optax.apply_updates(state.features, updates)
        new_state = OptimState(features=features, weights=weights,
                               opt_state=opt_state)
        if error_guided:
            from bnv_fusion_tpu import sampler
            new_map = sampler.update_error_map(
                error_map, depth.shape, pixel_ids, ray_errs.reshape(-1))
            return new_state, jnp.mean(losses), new_map
        return new_state, jnp.mean(losses)

    def multi_step(state: OptimState, table: tbl.AnyTable,
                   depths: jnp.ndarray, T_wcs: jnp.ndarray,
                   intrs: jnp.ndarray, bound_min: jnp.ndarray,
                   n_xyz: jnp.ndarray, sdf_delta: jnp.ndarray | None, keys,
                   error_maps: jnp.ndarray | None = None,
                   lr_scales: jnp.ndarray | None = None):
        """Several Adam iterations (one random frame each) in ONE device
        launch — amortizes the tunneled runtime's per-dispatch overhead
        (~64 ms) over the iterations.  Semantics identical to calling
        ``step`` sequentially.  ``lr_scales`` (one scalar per iteration)
        implements trainer.optim_lr_schedule; None = constant lr."""
        if lr_scales is None:
            lr_scales = jnp.ones((depths.shape[0],), jnp.float32)

        def body(st, inp):
            if error_guided:
                depth, T_wc, intr, key, ls, emap = inp
                st, loss, emap = step(st, table, depth, T_wc, intr, bound_min,
                                      n_xyz, sdf_delta, key, emap,
                                      lr_scale=ls)
                return st, (loss, emap)
            depth, T_wc, intr, key, ls = inp
            return step(st, table, depth, T_wc, intr, bound_min, n_xyz,
                        sdf_delta, key, lr_scale=ls)

        xs = ((depths, T_wcs, intrs, keys, lr_scales, error_maps)
              if error_guided else (depths, T_wcs, intrs, keys, lr_scales))
        state, ys = jax.lax.scan(body, state, xs)
        if error_guided:
            losses, emaps = ys
            return state, losses, emaps
        return state, ys

    return opt, jax.jit(step, donate_argnums=(0,)), \
        jax.jit(multi_step, donate_argnums=(0,))


def init_optim_state(opt, table: tbl.AnyTable) -> OptimState:
    return OptimState(features=table.features, weights=table.weights,
                      opt_state=opt.init(table.features))
