"""Ray sampling + SDF loss tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import render


def test_stratified_sampling_bounds_and_coverage(rng):
    key = jax.random.key(0)
    dists = jnp.asarray(rng.rand(32, 1).astype(np.float32) * 3 + 0.5)
    s = np.asarray(render.stratified_sampling(key, 16, dists))[..., 0]
    d = np.asarray(dists)[:, 0]
    assert (s >= -1e-6).all()
    assert (s <= d[:, None] + 1e-6).all()
    # sorted within each ray (strata are ordered)
    assert (np.diff(s, axis=1) >= -1e-6).all()


def test_hierarchical_sampling_band_and_sorted():
    key = jax.random.key(1)
    n = 8
    depths = jnp.full((n,), 2.0)
    dirs = jnp.asarray(np.repeat([[0.0, 0, 1]], n, 0).astype(np.float32))
    cam = jnp.zeros((3,))
    surface = dirs * depths[:, None]
    pts, dists = render.hierarchical_sampling(
        key, 10, 5, depths, surface, dirs, cam, offset_distance=0.3)
    d = np.asarray(dists)[..., 0]
    assert d.shape == (n, 15)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    # fine band: at least 10 samples within [depth-0.3, depth+0.3]
    in_band = (d > 2.0 - 0.3 - 1e-6) & (d < 2.0 + 0.3 + 1e-6)
    assert (in_band.sum(1) >= 10).all()
    # coarse: everything else between camera and surface
    assert (d >= -1e-6).all() and (d <= 2.3 + 1e-6).all()


def test_hierarchical_sampling_close_surface_clamps_offset():
    key = jax.random.key(2)
    depths = jnp.full((4,), 0.1)  # closer than the offset distance
    dirs = jnp.asarray(np.repeat([[0.0, 0, 1]], 4, 0).astype(np.float32))
    surface = dirs * depths[:, None]
    pts, dists = render.hierarchical_sampling(
        key, 6, 4, depths, surface, dirs, jnp.zeros((3,)), 0.3)
    d = np.asarray(dists)[..., 0]
    # start point falls back to the camera: no negative distances
    assert (d >= -1e-6).all()


def _perfect_rays(n=16, depth=2.0):
    uv = np.stack([np.full(n, 80.0), np.full(n, 60.0)], -1).astype(np.float32)
    gt = np.repeat([[0, 0, depth]], n, 0).astype(np.float32)
    return render.Rays(
        uv=jnp.asarray(uv),
        gt_pts=jnp.asarray(gt),
        mask=jnp.ones((n,), jnp.float32),
        neighbor_pts=jnp.asarray(gt[:, None, :]),
        neighbor_masks=jnp.ones((n, 1), jnp.float32),
        T_wc=jnp.eye(4),
        intr=jnp.asarray(np.array([[200.0, 0, 80], [0, 200, 60], [0, 0, 1]],
                                  np.float32)))


def test_sdf_loss_zero_for_exact_prediction():
    rays = _perfect_rays()
    cam = jnp.zeros((3,))
    n, s = 16, 9
    d = jnp.asarray(np.tile(np.linspace(1.5, 2.4, s), (n, 1)).astype(np.float32))
    pts = jnp.concatenate(
        [jnp.zeros((n, s, 2)), d[..., None]], axis=-1)
    trunc = 0.3
    gt_sdf = jnp.clip(2.0 - d, -trunc, trunc)
    loss = render.compute_sdf_loss(rays, gt_sdf, pts, cam, trunc)
    assert float(loss) < 1e-6


def test_sdf_loss_positive_for_wrong_prediction():
    rays = _perfect_rays()
    cam = jnp.zeros((3,))
    n, s = 16, 9
    d = jnp.asarray(np.tile(np.linspace(1.5, 2.4, s), (n, 1)).astype(np.float32))
    pts = jnp.concatenate([jnp.zeros((n, s, 2)), d[..., None]], axis=-1)
    pred = jnp.zeros((n, s))
    loss = render.compute_sdf_loss(rays, pred, pts, cam, 0.3)
    assert float(loss) > 0.05


def test_sdf_loss_masked_rays_ignored():
    rays = _perfect_rays()
    rays = rays._replace(mask=jnp.zeros((16,), jnp.float32))
    cam = jnp.zeros((3,))
    d = jnp.asarray(np.tile(np.linspace(1.5, 2.4, 9), (16, 1)).astype(np.float32))
    pts = jnp.concatenate([jnp.zeros((16, 9, 2)), d[..., None]], axis=-1)
    loss = render.compute_sdf_loss(rays, jnp.zeros((16, 9)), pts, cam, 0.3)
    assert float(loss) < 1e-6


def test_sample_pdf_concentrates_on_heavy_bins():
    import jax

    bins = jnp.asarray(np.tile(np.linspace(0, 1, 9), (4, 1)).astype(np.float32))
    w = np.zeros((4, 8), np.float32)
    w[:, 5] = 10.0  # mass in bin [0.625, 0.75]
    s = np.asarray(render.sample_pdf(jax.random.key(0), bins,
                                     jnp.asarray(w), 64))
    assert s.shape == (4, 64)
    inside = ((s > 0.625) & (s < 0.75)).mean()
    assert inside > 0.9
    # deterministic mode covers the full cdf range monotonically
    sd = np.asarray(render.sample_pdf(jax.random.key(0), bins,
                                      jnp.asarray(w), 16, det=True))
    assert (np.diff(sd, axis=1) >= -1e-6).all()


def test_composite_occupancy_picks_first_surface():
    n, s = 3, 10
    d = np.tile(np.linspace(0.1, 1.0, s), (n, 1)).astype(np.float32)
    pts = np.zeros((n, s, 3), np.float32)
    pts[..., 2] = d
    occ = np.zeros((n, s), np.float32)
    occ[:, 4] = 1.0  # opaque at sample 4
    expected, depth_prob, background = render.composite_occupancy(
        jnp.asarray(pts), jnp.asarray(occ), jnp.asarray(d[..., None]))
    np.testing.assert_allclose(np.asarray(expected)[:, 2], d[:, 4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(background), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth_prob)[:, 4], 1.0, atol=1e-6)
