"""Visualization helpers: depth colormaps, normal shading, colored point PLYs.

Rebuilds the reference's torchvision_utils (depth colormaps,
reference src/utils/torchvision_utils.py) and the vis_utils point-cloud
helpers (np2pc etc., reference src/utils/vis_utils.py) without
torchvision/open3d — plain numpy + PNG via cv2.
"""

from __future__ import annotations

import numpy as np

from bnv_fusion_tpu.mesh import Mesh


def colorize_depth(depth: np.ndarray, max_depth: float | None = None
                   ) -> np.ndarray:
    """Depth map -> uint8 RGB turbo-like colormap; invalid (<=0) is black."""
    valid = depth > 0
    if max_depth is None:
        max_depth = float(depth[valid].max()) if valid.any() else 1.0
    t = np.clip(depth / max_depth, 0, 1)
    # compact turbo approximation (polynomial fit)
    r = np.clip(1.8 * t - 0.2, 0, 1)
    g = np.clip(np.sin(np.pi * t) * 1.1, 0, 1)
    b = np.clip(1.2 - 1.6 * t, 0, 1)
    rgb = np.stack([r, g, b], -1)
    rgb[~valid] = 0
    return (rgb * 255).astype(np.uint8)


def colorize_normals(normals: np.ndarray) -> np.ndarray:
    """Unit normals [-1,1] -> uint8 RGB (the reference's (n*0.5+0.5)*255)."""
    return np.clip((normals * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)


def save_image(path: str, rgb_uint8: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, rgb_uint8[..., ::-1])


def save_pointcloud_ply(path: str, pts: np.ndarray,
                        colors: np.ndarray | None = None) -> None:
    """Colored point cloud PLY (replacement for vis_utils.np2pc + o3d IO)."""
    n = len(pts)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(b"property uchar red\nproperty uchar green\n"
                    b"property uchar blue\n")
        f.write(b"end_header\n")
        if colors is None:
            f.write(pts.astype("<f4").tobytes())
        else:
            xyz = pts.astype("<f4").view("u1").reshape(n, 12)
            rgb = colors.astype("u1").reshape(n, 3)
            f.write(np.concatenate([xyz, rgb], axis=1).tobytes())


def mesh_with_normal_colors(mesh: Mesh) -> np.ndarray:
    """Per-vertex normal-shaded colors for quick mesh inspection."""
    v, f = mesh.vertices, mesh.faces
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    vn = np.zeros_like(v)
    np.add.at(vn, f[:, 0], fn)
    np.add.at(vn, f[:, 1], fn)
    np.add.at(vn, f[:, 2], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
    return colorize_normals(vn)
