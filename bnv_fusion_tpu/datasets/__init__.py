"""Dataset readers + synthetic scene generators.

Importing this package registers all dataset readers with the registry,
mirroring reference src/datasets/__init__.py (including the reference's
missing fusion_pointnet_dataset registration — a known quirk fixed here).
"""

from bnv_fusion_tpu.datasets.registry import get_dataset, register  # noqa: F401
from bnv_fusion_tpu.datasets import canonical  # noqa: F401
from bnv_fusion_tpu.datasets import synth_scene  # noqa: F401
from bnv_fusion_tpu.datasets import scannet  # noqa: F401
from bnv_fusion_tpu.datasets import synthetic_idr  # noqa: F401
from bnv_fusion_tpu.datasets import arkit  # noqa: F401
from bnv_fusion_tpu.datasets import pointnet_patches  # noqa: F401
from bnv_fusion_tpu.datasets import fusion_windows  # noqa: F401
from bnv_fusion_tpu.datasets import refiner  # noqa: F401
