"""Canonical preprocessed layout reader ("fusion_inference_dataset").

Reads the reference's preprocessed scene layout
(reference src/datasets/fusion_inference_dataset.py:105-144):
``{scan}/image/{i}.jpg, depth/{i}.png, pose/T_wc_{i}.txt,
pose/intr_mat_{i}.txt, pose/dimensions.txt`` with millimeter depth PNGs.

TPU-first split of responsibilities: readers return raw host arrays
(depth/pose/intrinsics); back-projection and normal estimation happen on
device inside the jitted fusion step (the reference does them per frame in
numpy/kornia on the loader path).
"""

from __future__ import annotations

import os
from typing import Dict

import cv2
import numpy as np

from bnv_fusion_tpu.datasets.registry import register


def load_depth_png(path: str, depth_scale: float = 1000.0,
                   max_depth: float | None = None,
                   downsample_scale: float = 0.0) -> np.ndarray:
    """mm PNG -> metric float32 depth, invalid/far pixels zeroed
    (reference src/utils/common.py:86-120, without the dead noise path)."""
    depth = cv2.imread(path, -1)
    if depth is None:
        raise FileNotFoundError(path)
    depth = depth.astype(np.float32) / depth_scale
    if downsample_scale and downsample_scale > 0:
        h, w = depth.shape
        depth = cv2.resize(depth, (int(w * downsample_scale),
                                   int(h * downsample_scale)),
                           interpolation=cv2.INTER_NEAREST)
    if max_depth is not None:
        depth = np.where(depth < max_depth, depth, 0.0)
    return depth


def load_matrix_txt(path: str) -> np.ndarray:
    with open(path, "r") as f:
        vals = [float(t) for t in f.read().split()]
    n = int(round(len(vals) ** 0.5))
    return np.asarray(vals, np.float32).reshape(n, n)


@register("fusion_inference_dataset")
class FusionInferenceDataset:
    def __init__(self, cfg, stage: str = "val"):
        d = cfg.dataset
        self.scan_id = d.scan_id
        self.max_depth = float(cfg.model.ray_tracer.ray_max_dist)
        self.depth_scale = float(getattr(d, "depth_scale", 1000.0))
        self.downsample_scale = float(getattr(d, "downsample_scale", 0.0))
        self.load_color = bool(getattr(d, "load_color", False))
        # stage sensor-native uint16 depth alongside the metric f32 (the
        # pipeline transfers the raw array and converts on device)
        self.stage_raw_depth = bool(getattr(d, "stage_raw_depth", False))
        root = os.path.join(d.data_dir, self.scan_id)
        dim_path = os.path.join(root, "pose", "dimensions.txt")
        with open(dim_path, "r") as f:
            line = f.read().splitlines()[0].split(" ")
            self.dimensions = np.asarray([float(x) for x in line], np.float32)
        n = len(os.listdir(os.path.join(root, "image")))
        skip = int(getattr(d, "skip_images", 1)) or 1
        self.frame_ids = list(range(0, n))
        self.root = root
        self.skip = skip

    def __len__(self):
        return len(self.frame_ids)

    def __getitem__(self, idx: int) -> Dict:
        i = self.frame_ids[idx]
        depth = load_depth_png(
            os.path.join(self.root, "depth", f"{i}.png"),
            self.depth_scale, self.max_depth, self.downsample_scale)
        T_wc = load_matrix_txt(
            os.path.join(self.root, "pose", f"T_wc_{i}.txt"))
        intr = load_matrix_txt(
            os.path.join(self.root, "pose", f"intr_mat_{i}.txt"))[:3, :3]
        if self.downsample_scale and self.downsample_scale > 0:
            intr = intr.copy()
            intr[:2, :3] *= self.downsample_scale
        frame = {
            "frame_id": i,
            "scene_id": self.scan_id,
            "depth": depth,
            "T_wc": T_wc,
            "intr_mat": intr,
            "img_path": os.path.join(self.root, "image", f"{i}.jpg"),
        }
        if self.stage_raw_depth:
            raw = cv2.imread(os.path.join(self.root, "depth", f"{i}.png"), -1)
            if self.downsample_scale and self.downsample_scale > 0:
                hh, ww = raw.shape
                raw = cv2.resize(raw, (int(ww * self.downsample_scale),
                                       int(hh * self.downsample_scale)),
                                 interpolation=cv2.INTER_NEAREST)
            frame["depth_raw"] = raw.astype(np.uint16)
            frame["depth_scale"] = self.depth_scale
        if self.load_color and os.path.exists(frame["img_path"]):
            img = cv2.imread(frame["img_path"], cv2.IMREAD_COLOR)[..., ::-1]
            h, w = depth.shape
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
            frame["rgb"] = img.astype(np.float32)
        return frame
