"""Error-guided sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import sampler


def test_sample_pixels_in_range():
    em = sampler.create_error_maps(1, (64, 128), patch=16)[0]
    ids = np.asarray(sampler.sample_pixels(jax.random.key(0), em, (64, 128),
                                           512))
    assert ids.shape == (512,)
    assert ids.min() >= 0 and ids.max() < 64 * 128


def test_high_error_patch_oversampled():
    em = sampler.create_error_maps(1, (64, 64), patch=16)[0] * 1e-6
    em = em.at[1, 2].set(10.0)  # rows 16..31, cols 32..47
    ids = np.asarray(sampler.sample_pixels(jax.random.key(1), em, (64, 64),
                                           4000, uniform_fraction=0.25))
    vy, vx = ids // 64, ids % 64
    in_patch = ((vy >= 16) & (vy < 32) & (vx >= 32) & (vx < 48)).mean()
    # 75% weighted samples should concentrate there (patch is 1/16 of image)
    assert in_patch > 0.5


def test_error_guided_optimization_integrates(pretrained_tcnn_path):
    """model.error_guided_sampling plumbs the sampler through the jitted
    optimize step: the run must converge (finite loss) and the per-frame
    error maps must move away from their uniform initialization."""
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.pipeline import NeuralMap

    cfg = load_config([
        "model.voxel_size=0.05",
        "dataset.num_images=4",
        "dataset.img_res=[120,160]",
        "dataset.num_pixels=512",
        "model.train_ray_splits=256",
        "model.table_capacity=131072",
        "model.min_pts_in_grid=2",
        "model.error_guided_sampling=true",
    ])
    ds = get_dataset(cfg, "val")
    params = load_pretrained(pretrained_tcnn_path)
    nm = NeuralMap(ds.dimensions, cfg, params)
    for i in range(len(ds)):
        nm.integrate(ds[i])
    nm.optimize(n_iters=6, last_frame=-1)
    assert nm._error_maps, "error maps should have been created"
    moved = any(not np.allclose(np.asarray(m), 1.0)
                for m in nm._error_maps.values())
    assert moved, "error maps never updated"
    assert np.isfinite(np.asarray(nm.table.features)).all()


def test_update_error_map_moves_toward_observations():
    em = sampler.create_error_maps(1, (32, 32), patch=16)[0]
    ids = jnp.asarray(np.arange(0, 256), jnp.int32)  # first rows -> patch (0,0)
    errs = jnp.full((256,), 5.0)
    new = sampler.update_error_map(em, (32, 32), ids, errs, momentum=0.5)
    new = np.asarray(new)
    assert abs(new[0, 0] - 3.0) < 1e-5  # 0.5*1 + 0.5*5
    assert new[1, 1] == 1.0             # untouched patch unchanged
