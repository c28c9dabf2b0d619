"""Facade over the two sparse voxel table implementations.

* ``DenseIndexedTable`` (bnv_fusion_tpu.table_dense) — the default: a dense
  int32 slot map over the scene grid, loop-free O(1) inserts/lookups.  Used
  whenever the scene's voxel count fits int32/memory (all reference
  operating points do).
* ``SparseVoxelTable`` (bnv_fusion_tpu.table) — open-addressing hash for
  scenes too large for a dense slot map.

Both expose insert/lookup/gather_values/active_entries with identical
semantics; dispatch is static (python isinstance) so it is jit-transparent.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

from bnv_fusion_tpu import table as _hash
from bnv_fusion_tpu import table_dense as _dense

AnyTable = Union[_hash.SparseVoxelTable, _dense.DenseIndexedTable]

# dense slot maps beyond this many voxels fall back to hashing (int32 limit
# guards correctness; this guards memory: 512M * 4B = 2 GB)
DENSE_MAP_MAX_VOXELS = 512 * 1024 * 1024


def create_table(feat_dims: int, capacity: int, n_xyz=None) -> AnyTable:
    if n_xyz is not None:
        n_vox = int(n_xyz[0]) * int(n_xyz[1]) * int(n_xyz[2])
        if n_vox < DENSE_MAP_MAX_VOXELS:
            return _dense.create_dense_table(n_xyz, capacity, feat_dims)
    return _hash.create_table(capacity, feat_dims)


def _mod(table: AnyTable):
    return _dense if isinstance(table, _dense.DenseIndexedTable) else _hash


def insert(table: AnyTable, keys: jnp.ndarray, valid: jnp.ndarray):
    return _mod(table).insert(table, keys, valid)


def lookup(table: AnyTable, query: jnp.ndarray,
           valid: jnp.ndarray | None = None):
    return _mod(table).lookup(table, query, valid)


def gather_values(table: AnyTable, slots, found):
    return _mod(table).gather_values(table, slots, found)


def occupancy(table: AnyTable):
    return _mod(table).occupancy(table)


def active_entries(table: AnyTable):
    return _mod(table).active_entries(table)


def load_entries(like: AnyTable, coords, features, weights, num_hits
                 ) -> AnyTable:
    """Rebuild a table of the same kind/shape as ``like`` from saved entries."""
    if isinstance(like, _dense.DenseIndexedTable):
        import numpy as np

        return _dense.load_entries(np.asarray(like.n_xyz), like.capacity,
                                   coords, features, weights, num_hits)
    return _hash.load_entries(like.capacity, coords, features, weights,
                              num_hits)


def replicated_spec(like: AnyTable):
    """PartitionSpec pytree replicating every leaf of a table (shard_map)."""
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(lambda _: P(), like)
