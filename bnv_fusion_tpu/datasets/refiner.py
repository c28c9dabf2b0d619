"""Refiner dataset readers ("fusion_refiner_dataset", "…_scannet_dataset").

Rebuilds the reference's FusionRefinerDataset / FusionRefinerScanNetDataset
(reference src/datasets/fusion_dataset.py:453-573): per-frame loaders over
the canonical preprocessed layout resp. the raw ScanNet ``frames/`` layout,
feeding global refinement as offline training (train.py with
model=fusion_refiner_model).

TPU-first split of responsibilities: the reference classes also sample
``num_pixels`` rays per frame on host and gather each ray's 15x15 pixel
neighborhood (fusion_dataset.py:349-374,424-436); here the readers return
raw frames only — ray sampling and the neighbor window run on device inside
the jitted optimize step (optimize.build_rays_from_frame with
``model.neighbor_kernel`` = 15 in configs/model/fusion_refiner_model.yaml).
What remains host-side is exactly the reference's frame selection policy:
``skip_images`` striding with a ``sample_shift`` offset
(fusion_dataset.py:460-464; the ScanNet variant strides without shift,
:518).
"""

from __future__ import annotations

import numpy as np

from bnv_fusion_tpu.datasets.canonical import FusionInferenceDataset
from bnv_fusion_tpu.datasets.registry import register
from bnv_fusion_tpu.datasets.scannet import FusionInferenceDatasetScanNet


@register("fusion_refiner_dataset")
class FusionRefinerDataset(FusionInferenceDataset):
    """Canonical-layout refiner reader (reference fusion_dataset.py:453-507).

    Same ``{scan}/image, depth, pose`` layout as fusion_inference_dataset;
    the refiner flow additionally strides the sequence by ``skip_images``
    starting at ``sample_shift`` (the reference trains the refiner on every
    skip-th frame of the full capture, fusion_dataset.py:460-462)."""

    def __init__(self, cfg, stage: str = "train"):
        super().__init__(cfg, stage)
        d = cfg.dataset
        shift = int(getattr(d, "sample_shift", 0) or 0)
        n = len(self.frame_ids)
        ids = np.arange(shift, n, max(self.skip, 1))
        if stage != "train":
            # reference :460-463: every non-train stage (val AND test)
            # keeps only the first two strided frames
            ids = ids[:2]
        self.frame_ids = [self.frame_ids[i] for i in ids]


@register("fusion_refiner_scannet_dataset")
class FusionRefinerScanNetDataset(FusionInferenceDatasetScanNet):
    """ScanNet-layout refiner reader (reference fusion_dataset.py:510-573).

    Identical to fusion_inference_dataset_scannet (axis-align + GT-mesh
    recentering, ``frames/`` layout, skip striding) — the reference's extra
    host-side work (ray sampling, 15x15 windows) runs on device here."""

    def __init__(self, cfg, stage: str = "train"):
        super().__init__(cfg, stage)
