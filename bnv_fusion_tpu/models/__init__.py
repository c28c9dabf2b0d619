"""Model registry; importing registers all trainers
(reference src/models/models.py + src/models/__init__.py)."""

from bnv_fusion_tpu.models.registry import get_model, register  # noqa: F401
from bnv_fusion_tpu.models import local_point_fusion  # noqa: F401
from bnv_fusion_tpu.models import fusion_refiner  # noqa: F401
