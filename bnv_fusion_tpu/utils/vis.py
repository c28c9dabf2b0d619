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


def render_mesh_preview(mesh: Mesh, img_res=(480, 640),
                        eye=None, target=None) -> np.ndarray:
    """Headless software rendering of a mesh (z-buffer rasterizer, flat
    normal shading).  Stands in for the reference's pangolin/Open3D visual
    checks (reference src/utils/pangolin_helper.py) in display-less
    environments.  Returns a uint8 RGB image.
    """
    from bnv_fusion_tpu.datasets.synth_scene import look_at_pose

    v, f = mesh.vertices, mesh.faces
    if len(f) == 0:
        return np.zeros(img_res + (3,), np.uint8)
    center = 0.5 * (v.min(0) + v.max(0))
    radius = float(np.linalg.norm(v.max(0) - v.min(0))) / 2 + 1e-6
    if eye is None:
        eye = center + np.array([1.2, -1.8, 1.2]) * radius
    if target is None:
        target = center
    T_wc = look_at_pose(np.asarray(eye), np.asarray(target))
    T_cw = np.linalg.inv(T_wc)
    h, w = img_res
    focal = 0.9 * w

    cam = v @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = np.maximum(cam[:, 2], 1e-6)
    u = cam[:, 0] / z * focal + w / 2
    vv = cam[:, 1] / z * focal + h / 2

    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    light = np.array([0.4, -0.6, 0.7])
    light /= np.linalg.norm(light)
    shade = (0.25 + 0.75 * np.abs(fn @ light))

    img = np.zeros((h, w, 3), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    # splat triangles as their rasterized bounding boxes (small tris assumed)
    tri_u = u[f]
    tri_v = vv[f]
    tri_z = z[f].mean(1)
    order = np.argsort(-tri_z)  # far to near: nearer splats overwrite
    base = np.array([0.55, 0.65, 0.8])
    for ti in order:
        u0, u1 = int(tri_u[ti].min()), int(np.ceil(tri_u[ti].max()))
        v0, v1 = int(tri_v[ti].min()), int(np.ceil(tri_v[ti].max()))
        if u1 < 0 or v1 < 0 or u0 >= w or v0 >= h:
            continue
        u0, v0 = max(u0, 0), max(v0, 0)
        u1, v1 = min(u1 + 1, w), min(v1 + 1, h)
        if (u1 - u0) * (v1 - v0) > 64 * 64:
            continue  # degenerate/huge projected triangle
        patch_z = tri_z[ti]
        sel = zbuf[v0:v1, u0:u1] > patch_z
        zbuf[v0:v1, u0:u1][sel] = patch_z
        img[v0:v1, u0:u1][sel] = base * shade[ti]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


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
