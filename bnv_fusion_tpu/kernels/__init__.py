"""Pallas TPU kernels for the hot compute paths (XLA fallbacks everywhere)."""

from bnv_fusion_tpu.kernels.fused_decode import (  # noqa: F401
    fused_corner_decode, fused_decode_available)
