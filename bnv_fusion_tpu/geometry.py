"""Pure-jnp geometry library: back-projection, normals, camera rays.

TPU-native replacement for the reference's numpy/kornia geometry layer
(reference src/utils/geometry.py, kornia depth_to_3d/depth_to_normals used in
src/datasets/fusion_inference_dataset.py:52-59, and the ray helpers in
src/utils/render_utils.py:411-458).  Everything here is shape-static and
jit-friendly; masks carry validity instead of boolean indexing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def get_homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 4] with a trailing 1 (reference geometry.py:75-109)."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a [4,4] rigid transform to [..., 3] points."""
    return pts @ T[:3, :3].T + T[:3, 3]


def rotate_vectors(T: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part of a [4,4] transform to [..., 3] vectors."""
    return vec @ T[:3, :3].T


def depth_to_xyz_np(depth, intr):
    """Host-side twin of depth_to_xyz (dataset preprocessing paths)."""
    import numpy as _np

    h, w = depth.shape
    uu, vv = _np.meshgrid(_np.arange(w, dtype=_np.float32),
                          _np.arange(h, dtype=_np.float32))
    x = (uu - intr[0, 2]) / intr[0, 0] * depth
    y = (vv - intr[1, 2]) / intr[1, 1] * depth
    return _np.stack([x, y, depth], axis=-1).astype(_np.float32)


def depth_to_xyz(depth: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Back-project a [H, W] depth map to a camera-frame [H, W, 3] xyz map.

    Matches reference geometry.depth2xyz (src/utils/geometry.py:150-171):
    pinhole model, pixel centers at integer coordinates.
    """
    h, w = depth.shape
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    u = (jnp.arange(w, dtype=depth.dtype)[None, :] - cx) / fx
    v = (jnp.arange(h, dtype=depth.dtype)[:, None] - cy) / fy
    x = u * depth
    y = v * depth
    return jnp.stack([x, y, depth], axis=-1)


def normals_from_depth(depth: jnp.ndarray, intr: jnp.ndarray,
                       mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Camera-frame surface normals from a depth map via central differences.

    Replaces kornia.geometry.depth.depth_to_normals
    (reference src/datasets/fusion_inference_dataset.py:52-55): back-project
    to an xyz map, take spatial gradients, normal = cross(d/du, d/dv),
    normalized and oriented to face the camera (-z hemisphere), which is the
    sign convention the pretrained encoder expects (points on the camera side
    of the surface have positive SDF).
    """
    xyz = depth_to_xyz(depth, intr)
    if mask is not None:
        xyz = jnp.where(mask[..., None], xyz, 0.0)

    # central differences in the interior, one-sided at the image borders
    # (a roll-based version would difference opposite image edges at
    # rows/cols 0 and H-1/W-1, producing garbage border normals)
    du = jnp.gradient(xyz, axis=1)
    dv = jnp.gradient(xyz, axis=0)
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-8)
    # orient toward the camera: viewing ray is +xyz, so flip if n . xyz > 0
    flip = jnp.sum(n * xyz, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def lift_pixels(uv: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Lift [N, 2] pixel coords (x=u, y=v) to z=1 camera-frame rays [N, 3].

    Matches reference render_utils.lift (src/utils/render_utils.py:411-428)
    including the skew term.
    """
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    sk = intr[0, 1]
    x, y = uv[..., 0], uv[..., 1]
    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx
    y_lift = (y - cy) / fy
    return jnp.stack([x_lift, y_lift, jnp.ones_like(x)], axis=-1)


def get_camera_rays(uv: jnp.ndarray, T_wc: jnp.ndarray, intr: jnp.ndarray):
    """Pixel coords -> (unit world-space ray dirs [N,3], camera center [3]).

    Matches reference render_utils.get_camera_params
    (src/utils/render_utils.py:431-458) for matrix poses.
    """
    cam_loc = T_wc[:3, 3]
    pts_cam = lift_pixels(uv, intr)
    pts_world = transform_points(T_wc, pts_cam)
    dirs = pts_world - cam_loc
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    return dirs, cam_loc


def aabb_intersection(a: np.ndarray, b: np.ndarray) -> float:
    """Intersection volume of two AABBs given as [2, 3] (min, max) rows
    (reference geometry.py:112-279 AABB helpers)."""
    lo = np.maximum(a[0], b[0])
    hi = np.minimum(a[1], b[1])
    ext = np.maximum(hi - lo, 0.0)
    return float(np.prod(ext))


def aabb_volume(a: np.ndarray) -> float:
    return float(np.prod(np.maximum(a[1] - a[0], 0.0)))


def aabb_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = aabb_intersection(a, b)
    union = aabb_volume(a) + aabb_volume(b) - inter
    return inter / union if union > 0 else 0.0


def aabb_giou(a: np.ndarray, b: np.ndarray) -> float:
    """Generalized IoU for AABBs (reference geometry.py GIoU helper)."""
    inter = aabb_intersection(a, b)
    union = aabb_volume(a) + aabb_volume(b) - inter
    hull = np.stack([np.minimum(a[0], b[0]), np.maximum(a[1], b[1])])
    hull_vol = aabb_volume(hull)
    iou = inter / union if union > 0 else 0.0
    return iou - (hull_vol - union) / hull_vol if hull_vol > 0 else iou


class DepthNoiseSimulator:
    """Parametric Kinect-style depth noise (reference geometry.Simulator,
    src/utils/geometry.py:11-72, which loads a disparity distortion model
    file that is not vendored; this uses the standard axial noise model
    sigma(z) = a + b (z - z0)^2 plus small lateral pixel shuffling)."""

    def __init__(self, seed: int = 0, a: float = 0.0012, b: float = 0.0019,
                 z0: float = 0.4, lateral_px: float = 0.8):
        self.rng = np.random.RandomState(seed)
        self.a, self.b, self.z0 = a, b, z0
        self.lateral_px = lateral_px

    def simulate(self, depth: np.ndarray) -> np.ndarray:
        h, w = depth.shape
        valid = depth > 0
        sigma = self.a + self.b * np.square(depth - self.z0)
        noisy = depth + self.rng.randn(h, w) * sigma
        # lateral: jitter sampling position by ~1px
        du = np.clip(np.round(self.rng.randn(h, w) * self.lateral_px), -2, 2)
        dv = np.clip(np.round(self.rng.randn(h, w) * self.lateral_px), -2, 2)
        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        su = np.clip(uu + du, 0, w - 1).astype(np.int64)
        sv = np.clip(vv + dv, 0, h - 1).astype(np.int64)
        noisy = noisy[sv, su]
        return np.where(valid, np.maximum(noisy, 0.0), 0.0).astype(np.float32)


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection matrix into intrinsics + c2w pose (numpy).

    Same contract as the IDR helper the reference vendors
    (reference src/utils/geometry.py:607-627), used by the synthetic
    (cameras_sphere.npz) dataset reader.
    """
    import cv2

    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics.astype(np.float32), pose


@partial(jax.jit, static_argnames=("kernel_size",))
def gather_pixel_neighborhoods(xyz_map: jnp.ndarray, mask: jnp.ndarray,
                               uv: jnp.ndarray, kernel_size: int = 3):
    """Gather a k x k window of world points around each pixel.

    Device-side replacement for IterableInferenceDataset._get_neighbor_xyz
    (reference src/datasets/fusion_inference_dataset.py:334-359): returns
    ([N, k*k, 3] points, [N, k*k] bool mask), indices clamped at borders.
    ``uv`` is [N, 2] integer (x=u, y=v) pixel coords.
    """
    h, w = mask.shape
    half = kernel_size // 2
    offs = jnp.arange(-half, half + 1)
    # reference builds np.meshgrid(range_, range_) with default 'xy' indexing
    # and stacks [du, dv]: dx varies fastest along axis 0 of the window.
    dv, du = jnp.meshgrid(offs, offs, indexing="ij")
    du = du.reshape(-1)
    dv = dv.reshape(-1)
    u = jnp.clip(uv[:, None, 0] + du[None, :], 0, w - 1)
    v = jnp.clip(uv[:, None, 1] + dv[None, :], 0, h - 1)
    pts = xyz_map[v, u]
    m = mask[v, u]
    return pts, m
