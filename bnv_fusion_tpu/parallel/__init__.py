"""Multi-chip scaling: device meshes, sharded fusion and optimization.

The reference has no distributed story at all (single CUDA device hardcoded,
SURVEY §2.5); this package is designed, not ported: jax.sharding Mesh +
shard_map with XLA collectives over ICI.
"""

from bnv_fusion_tpu.parallel.mesh import make_mesh  # noqa: F401
from bnv_fusion_tpu.parallel.dp import (  # noqa: F401
    make_sharded_fuse_frame, make_sharded_optimize_iter,
    make_sharded_optimize_step, make_sharded_pretrain_step)
from bnv_fusion_tpu.parallel.spatial import (  # noqa: F401
    create_spatial_table, make_spatial_decode, make_spatial_fuse_frame)
