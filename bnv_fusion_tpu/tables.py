"""Facade over the three sparse voxel table implementations.

* ``DenseIndexedTable`` (bnv_fusion_tpu.table_dense) — the default: a dense
  int32 slot map over the scene grid, loop-free O(1) inserts/lookups.  Used
  whenever the scene's voxel count fits the map's memory (all reference
  operating points do).
* ``BlockIndexedTable`` (bnv_fusion_tpu.table_blocks) — big scenes: the slot
  map lives at 4^3-block granularity (64x smaller), still loop-free; covers
  grids up to int32 flat ids (2^31 voxels).
* ``SparseVoxelTable`` (bnv_fusion_tpu.table) — open-addressing hash for
  unbounded scenes (no n_xyz).  Its probe loops compile/run poorly on the
  tunneled TPU runtime — it is never auto-routed when bounds are known.

Routing policy (big-scene story, pinned by tests/test_table.py
TestRoutingPolicy): dense < 512M voxels <= blocks < 2^31 flat ids.  The
flat-id ceiling is int32 in EVERY bounded layout (spatial sharding,
bnv_fusion_tpu.parallel.spatial, divides HBM across chips but keeps global
int32 ids) — beyond it create_table raises with actionable advice
(coarser voxels), and the only unbounded option is the hash table with its
documented ~0.7 us/key insert cost.  The reference OOMs far earlier
(src/scripts/run_inference_on_scannet.py:14).

All expose insert/lookup/gather_values/active_entries with identical
semantics; dispatch is static (python isinstance) so it is jit-transparent.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

from bnv_fusion_tpu import table as _hash
from bnv_fusion_tpu import table_blocks as _blocks
from bnv_fusion_tpu import table_dense as _dense

AnyTable = Union[_hash.SparseVoxelTable, _dense.DenseIndexedTable,
                 _blocks.BlockIndexedTable]

# dense slot maps beyond this many voxels switch to block granularity (the
# limit guards memory: 512M * 4B = 2 GB of map)
DENSE_MAP_MAX_VOXELS = 512 * 1024 * 1024


def create_table(feat_dims: int, capacity: int, n_xyz=None) -> AnyTable:
    if n_xyz is not None:
        n_vox = int(n_xyz[0]) * int(n_xyz[1]) * int(n_xyz[2])
        if n_vox < DENSE_MAP_MAX_VOXELS:
            return _dense.create_dense_table(n_xyz, capacity, feat_dims)
        # raises beyond 2^31 voxels, pointing at spatial sharding.
        # capacity is denominated in voxels; a surface crossing a 4^3 block
        # touches ~1/4 of its 64 slots, so block tables get 4x slot headroom
        return _blocks.create_block_table(n_xyz, capacity * 4, feat_dims)
    return _hash.create_table(capacity, feat_dims)


def _mod(table: AnyTable):
    if isinstance(table, _dense.DenseIndexedTable):
        return _dense
    if isinstance(table, _blocks.BlockIndexedTable):
        return _blocks
    return _hash


def insert(table: AnyTable, keys: jnp.ndarray, valid: jnp.ndarray):
    return _mod(table).insert(table, keys, valid)


def lookup(table: AnyTable, query: jnp.ndarray,
           valid: jnp.ndarray | None = None):
    return _mod(table).lookup(table, query, valid)


def gather_values(table: AnyTable, slots, found):
    return _mod(table).gather_values(table, slots, found)


def occupancy(table: AnyTable):
    return _mod(table).occupancy(table)


def active_entries(table: AnyTable, with_features: bool = True):
    return _mod(table).active_entries(table, with_features=with_features)


def insert_unique_flat(table: AnyTable, flat: jnp.ndarray,
                       valid: jnp.ndarray):
    """Insert-or-find precomputed voxel flat ids (sort-reduce fuse hot path).

    Only the compacted slot-map tables (dense, blocks) support flat ids."""
    return _mod(table).insert_unique_flat(table, flat, valid)


def load_entries(like: AnyTable, coords, features, weights, num_hits
                 ) -> AnyTable:
    """Rebuild a table of the same kind/shape as ``like`` from saved entries."""
    import numpy as np

    if isinstance(like, _dense.DenseIndexedTable):
        return _dense.load_entries(np.asarray(like.n_xyz), like.capacity,
                                   coords, features, weights, num_hits)
    if isinstance(like, _blocks.BlockIndexedTable):
        return _blocks.load_entries(np.asarray(like.n_xyz), like.capacity,
                                    coords, features, weights, num_hits)
    return _hash.load_entries(like.capacity, coords, features, weights,
                              num_hits)


def replicated_spec(like: AnyTable):
    """PartitionSpec pytree replicating every leaf of a table (shard_map)."""
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(lambda _: P(), like)
