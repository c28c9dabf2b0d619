"""Error-guided pixel sampling for the global optimization.

Rebuilds the reference's SampleManager (reference src/datasets/sampler.py:
7-94): per-frame coarse error maps; ray batches mix uniform samples with
samples drawn from a multinomial over error patches, and rendered errors are
scattered back to keep the maps current.  (The reference imports it but never
enables it in the committed flow; here it is an opt-in for the optimizer.)

Pure-jnp with explicit keys; the error maps are a [n_frames, gh, gw] device
array threaded through the caller's state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def create_error_maps(n_frames: int, img_res: Tuple[int, int],
                      patch: int = 16) -> jnp.ndarray:
    """Uniform-initialized error maps: [n_frames, H//patch, W//patch]."""
    h, w = img_res
    return jnp.ones((n_frames, h // patch, w // patch), jnp.float32)


def sample_pixels(key, error_map: jnp.ndarray, img_res: Tuple[int, int],
                  n_samples: int, uniform_fraction: float = 0.5
                  ) -> jnp.ndarray:
    """Sample [n_samples] flat pixel ids: a uniform share plus an
    error-weighted share (multinomial over patches, uniform within a patch)."""
    h, w = img_res
    gh, gw = error_map.shape
    patch_h, patch_w = h // gh, w // gw
    n_uniform = int(n_samples * uniform_fraction)
    n_weighted = n_samples - n_uniform
    k1, k2, k3 = jax.random.split(key, 3)

    uniform = jax.random.randint(k1, (n_uniform,), 0, h * w)

    logits = jnp.log(jnp.maximum(error_map.reshape(-1), 1e-8))
    patches = jax.random.categorical(k2, logits, shape=(n_weighted,))
    py, px = patches // gw, patches % gw
    off = jax.random.randint(k3, (n_weighted, 2), 0,
                             jnp.asarray([patch_h, patch_w]))
    vy = py * patch_h + off[:, 0]
    vx = px * patch_w + off[:, 1]
    weighted = vy * w + vx
    return jnp.concatenate([uniform, weighted]).astype(jnp.int32)


def update_error_map(error_map: jnp.ndarray, img_res: Tuple[int, int],
                     pixel_ids: jnp.ndarray, errors: jnp.ndarray,
                     momentum: float = 0.7) -> jnp.ndarray:
    """EMA the observed per-pixel errors into their patches."""
    h, w = img_res
    gh, gw = error_map.shape
    patch_h, patch_w = h // gh, w // gw
    py = (pixel_ids // w) // patch_h
    px = (pixel_ids % w) // patch_w
    pid = jnp.clip(py, 0, gh - 1) * gw + jnp.clip(px, 0, gw - 1)
    sums = jnp.zeros((gh * gw,), jnp.float32).at[pid].add(errors)
    cnts = jnp.zeros((gh * gw,), jnp.float32).at[pid].add(1.0)
    mean = (sums / jnp.maximum(cnts, 1.0)).reshape(gh, gw)
    touched = (cnts > 0).reshape(gh, gw)
    new = momentum * error_map + (1 - momentum) * mean
    return jnp.where(touched, new, error_map)
