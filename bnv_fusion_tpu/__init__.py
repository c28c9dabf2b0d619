"""bnv_fusion_tpu — a TPU-native incremental dense 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of BNV-Fusion
(bi-level neural volume fusion, CVPR 2022; reference implementation
likojack/bnv_fusion).  The reference is a single-GPU CUDA/torch research
codebase; this framework re-designs the same pipeline TPU-first:

* the sparse voxel map is a fixed-capacity open-addressing hash table made of
  plain device arrays (replaces Open3D's GPU HashMap,
  reference src/models/sparse_volume.py),
* per-frame local fusion is one jitted, fixed-shape step: back-projection,
  PointNet corner encoding, segment-mean by voxel and a TSDF-style running
  mean update (replaces torch-scatter + dlpack round-trips,
  reference src/models/fusion/local_point_fusion.py:81-151,653-673),
* the hot SDF decode (8-corner gather + positional encoding + tiny MLP +
  trilinear blend) has a fused Pallas TPU kernel (replaces tiny-cuda-nn,
  reference src/models/fusion/modules.py),
* global fusion is differentiable volume rendering with optax Adam over the
  table features, scanned over fixed-size ray microbatches
  (reference src/run_e2e.py:111-162, src/utils/render_utils.py),
* multi-chip scaling uses jax.sharding Mesh + shard_map with XLA collectives
  (the reference has no distributed story at all).
"""

__version__ = "0.1.0"
