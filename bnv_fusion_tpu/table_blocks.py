"""Block-sparse slot-map voxel table: dense indexing at block granularity.

The default DenseIndexedTable (table_dense.py) keeps a dense int32 slot map
over the full voxel grid — perfect until the grid outgrows memory (the
512M-voxel routing guard in tables.py: 2 GB of map).  The open-addressing
fallback (table.py) works at any scale but its probe loops compile and run
pathologically on the tunneled TPU runtime (measured; see CLAUDE.md).

This table is the TPU-native middle ground replacing Open3D's GPU HashMap
(reference src/models/sparse_volume.py:484-892) for big scenes: the dense map
lives at BLOCK granularity (B=4, 64 voxels per block), shrinking it 64x, and
slots inside an allocated block are deterministic (block_slot * 64 + local
offset) — so insert/lookup stay loop-free gathers/scatters, exactly like the
dense table, and every fusion op (incl. the sort-reduce fuse path) runs
unchanged.  A 2^31-voxel scene needs a 134 MB block map; value arrays stay
compacted at [capacity] like the other tables.

Semantics note: allocating a block makes all 64 of its voxel slots "found"
with zero values.  That is observationally identical to the hash/dense
tables' zero default for missing keys — every consumer (decode mask, fusion
running mean, meshing weight threshold) treats weight-0 entries as absent.
active_entries() filters to slots carrying actual state (weight or hits).

Scenes beyond 2^31 voxels exceed int32 flat ids entirely; the documented
policy (tables.create_table) is to shard those spatially across chips
(bnv_fusion_tpu.parallel.spatial) rather than hash-probe on one chip.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

B = 4                 # block edge
BLOCK_SLOTS = B ** 3  # 64


class BlockIndexedTable(struct.PyTreeNode):
    block_map: jnp.ndarray   # [n_blocks] int32: block coord -> block slot, -1
    features: jnp.ndarray    # [capacity, F] float32 (capacity % 64 == 0)
    weights: jnp.ndarray     # [capacity] float32
    num_hits: jnp.ndarray    # [capacity] float32
    n_alloc: jnp.ndarray     # [] int32 — allocated BLOCKS
    overflow: jnp.ndarray    # [] int32 — voxels dropped (block space full)
    n_xyz: jnp.ndarray       # [3] int32 voxel grid dims (device copy)
    grid_shape: Tuple[int, int, int] = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.features.shape[0]

    @property
    def feat_dims(self) -> int:
        return self.features.shape[1]

    @property
    def n_voxels(self) -> int:
        gx, gy, gz = self.grid_shape
        return gx * gy * gz

    @property
    def block_grid(self) -> Tuple[int, int, int]:
        gx, gy, gz = self.grid_shape
        return (-(-gx // B), -(-gy // B), -(-gz // B))


def create_block_table(n_xyz, capacity: int, feat_dims: int
                       ) -> BlockIndexedTable:
    n_xyz = np.asarray(n_xyz, np.int64)
    n_vox = int(n_xyz[0]) * int(n_xyz[1]) * int(n_xyz[2])
    if n_vox >= 2 ** 31:
        raise ValueError(
            f"voxel grid {n_xyz.tolist()} has {n_vox} cells; flat ids "
            "exceed int32 — use a coarser voxel_size.  (For scenes that "
            "fit int32 ids but not one chip's HBM, set "
            "model.table_layout=spatial trainer.fuse_devices=N — NeuralMap "
            "builds the region-sharded map, bnv_fusion_tpu.parallel."
            "spatial; the flat-id ceiling itself is int32 in every "
            "layout, see PARITY.md)")
    capacity = -(-capacity // BLOCK_SLOTS) * BLOCK_SLOTS
    nb = int(np.prod([-(-int(d) // B) for d in n_xyz]))
    return BlockIndexedTable(
        block_map=jnp.full((nb,), -1, jnp.int32),
        features=jnp.zeros((capacity, feat_dims), jnp.float32),
        weights=jnp.zeros((capacity,), jnp.float32),
        num_hits=jnp.zeros((capacity,), jnp.float32),
        n_alloc=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
        n_xyz=jnp.asarray(n_xyz.astype(np.int32)),
        grid_shape=(int(n_xyz[0]), int(n_xyz[1]), int(n_xyz[2])),
    )


def _decompose(table: BlockIndexedTable, keys: jnp.ndarray):
    """[M, 3] voxel coords -> (block flat id [M], local slot offset [M])."""
    nbx, nby, nbz = table.block_grid
    bc = keys // B
    lc = keys - bc * B
    bflat = (bc[:, 0] * nby + bc[:, 1]) * nbz + bc[:, 2]
    local = (lc[:, 0] * B + lc[:, 1]) * B + lc[:, 2]
    return bflat, local


def _keys_from_flat(table: BlockIndexedTable, flat: jnp.ndarray) -> jnp.ndarray:
    """Voxel flat ids (x-major over the full grid) -> [M, 3] coords."""
    _, gy, gz = table.grid_shape
    x = flat // (gy * gz)
    y = (flat // gz) % gy
    z = flat % gz
    return jnp.stack([x, y, z], axis=-1)


def lookup(table: BlockIndexedTable, query: jnp.ndarray,
           valid: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find slots for [M, 3] keys: two gathers.  Returns (slots, found)."""
    if valid is None:
        valid = jnp.ones((query.shape[0],), bool)
    inside = jnp.all((query >= 0) & (query < table.n_xyz), axis=-1) & valid
    bflat, local = _decompose(table, jnp.where(inside[:, None], query, 0))
    bslot = table.block_map[bflat]
    found = inside & (bslot >= 0)
    slots = jnp.where(found, bslot * BLOCK_SLOTS + local, 0)
    return slots, found


def _alloc_blocks(table: BlockIndexedTable, bflat: jnp.ndarray,
                  want: jnp.ndarray):
    """Allocate blocks for the wanted block ids (duplicates fine).

    Returns (block_map, n_alloc, bslot [M], fits [M]) — same claim/prefix-sum
    pattern as table_dense.insert."""
    nb = table.block_map.shape[0]
    block_cap = table.capacity // BLOCK_SLOTS
    m = bflat.shape[0]

    existing = jnp.where(want, table.block_map[bflat], -1)
    is_new = want & (existing < 0)
    pos = jnp.arange(m, dtype=jnp.int32)
    claim_idx = jnp.where(is_new, bflat, nb)
    claim = jnp.full((nb,), m, jnp.int32).at[claim_idx].min(
        jnp.where(is_new, pos, m), mode="drop")
    winner = is_new & (claim[bflat] == pos)

    rank = jnp.cumsum(winner.astype(jnp.int32)) - 1
    assign = table.n_alloc + rank
    fits_new = winner & (assign < block_cap)
    n_new_total = jnp.sum(winner).astype(jnp.int32)

    map_idx = jnp.where(fits_new, bflat, nb)
    block_map = table.block_map.at[map_idx].set(
        jnp.where(fits_new, assign, 0), mode="drop")

    bslot = jnp.where(want, block_map[bflat], -1)
    n_alloc = jnp.minimum(table.n_alloc + n_new_total, block_cap)
    return block_map, n_alloc, bslot, want & (bslot >= 0)


def insert(table: BlockIndexedTable, new_keys: jnp.ndarray,
           valid: jnp.ndarray) -> Tuple[BlockIndexedTable, jnp.ndarray, jnp.ndarray]:
    """Loop-free insert-or-find of [M, 3] keys (duplicates allowed)."""
    inside = jnp.all((new_keys >= 0) & (new_keys < table.n_xyz), axis=-1) & valid
    bflat, local = _decompose(table, jnp.where(inside[:, None], new_keys, 0))
    block_map, n_alloc, bslot, ok = _alloc_blocks(table, bflat, inside)
    dropped = jnp.sum(inside & ~ok).astype(jnp.int32)
    table = table.replace(block_map=block_map, n_alloc=n_alloc,
                          overflow=table.overflow + dropped)
    slots = jnp.where(ok, bslot * BLOCK_SLOTS + local, 0)
    return table, slots, ok


def insert_unique_flat(table: BlockIndexedTable, flat: jnp.ndarray,
                       valid: jnp.ndarray
                       ) -> Tuple[BlockIndexedTable, jnp.ndarray, jnp.ndarray]:
    """insert on precomputed voxel flat ids (the sort-reduce fuse hot path).

    Keys need not be block-unique — block allocation dedups via scatter-min."""
    n_vox = table.n_voxels
    inside = valid & (flat >= 0) & (flat < n_vox)
    keys = _keys_from_flat(table, jnp.where(inside, flat, 0))
    bflat, local = _decompose(table, keys)
    block_map, n_alloc, bslot, ok = _alloc_blocks(table, bflat, inside)
    dropped = jnp.sum(inside & ~ok).astype(jnp.int32)
    table = table.replace(block_map=block_map, n_alloc=n_alloc,
                          overflow=table.overflow + dropped)
    slots = jnp.where(ok, bslot * BLOCK_SLOTS + local, 0)
    return table, slots, ok


def occupancy(table: BlockIndexedTable) -> jnp.ndarray:
    """Slots carrying state (weight or hits) — the voxel-level analog of the
    dense table's n_alloc."""
    return jnp.sum((table.weights > 0) | (table.num_hits > 0))


def gather_values(table: BlockIndexedTable, slots: jnp.ndarray,
                  found: jnp.ndarray):
    f = jnp.where(found[:, None], table.features[slots], 0.0)
    w = jnp.where(found, table.weights[slots], 0.0)
    h = jnp.where(found, table.num_hits[slots], 0.0)
    return f, w, h


def active_entries(table: BlockIndexedTable, with_features: bool = True):
    """Host-side extraction of state-carrying entries
    (coords, feats, weights, hits, slot idx), in slot order.
    ``with_features=False`` skips the feature fetch (features=None)."""
    block_map = np.asarray(table.block_map)
    bflats = np.nonzero(block_map >= 0)[0]
    bslots = block_map[bflats]
    order = np.argsort(bslots)
    bflats, bslots = bflats[order], bslots[order]

    nbx, nby, nbz = table.block_grid
    bx = bflats // (nby * nbz)
    by = (bflats // nbz) % nby
    bz = bflats % nbz
    lx, ly, lz = np.meshgrid(np.arange(B), np.arange(B), np.arange(B),
                             indexing="ij")
    lx, ly, lz = lx.reshape(-1), ly.reshape(-1), lz.reshape(-1)
    keys = np.stack([
        (bx[:, None] * B + lx[None, :]).reshape(-1),
        (by[:, None] * B + ly[None, :]).reshape(-1),
        (bz[:, None] * B + lz[None, :]).reshape(-1)], axis=-1).astype(np.int32)
    slots = (bslots[:, None] * BLOCK_SLOTS
             + np.arange(BLOCK_SLOTS)[None, :]).reshape(-1)

    w = np.asarray(table.weights)[slots]
    h = np.asarray(table.num_hits)[slots]
    live = (w > 0) | (h > 0)
    slots = slots[live]
    feats = np.asarray(table.features)[slots] if with_features else None
    return (keys[live], feats, w[live], h[live],
            slots)


def load_entries(n_xyz, capacity: int, coords, features, weights, num_hits
                 ) -> BlockIndexedTable:
    feat_dims = features.shape[1]
    table = create_block_table(n_xyz, capacity, feat_dims)
    coords = jnp.asarray(coords, jnp.int32)
    table, slots, ok = insert(table, coords,
                              jnp.ones((coords.shape[0],), bool))
    if not bool(jnp.all(ok)):
        raise ValueError(
            "load_entries: entries exceed block table capacity "
            f"{table.capacity}")
    return table.replace(
        features=table.features.at[slots].set(jnp.asarray(features)),
        weights=table.weights.at[slots].set(jnp.asarray(weights).reshape(-1)),
        num_hits=table.num_hits.at[slots].set(
            jnp.asarray(num_hits).reshape(-1)),
    )


def lookup_coords3(table: BlockIndexedTable, cx, cy, cz, inside):
    """lookup on per-axis coordinate arrays of ANY shape (see
    table_dense.lookup_coords3)."""
    nbx, nby, nbz = table.block_grid
    cx = jnp.where(inside, cx, 0)
    cy = jnp.where(inside, cy, 0)
    cz = jnp.where(inside, cz, 0)
    bcx, bcy, bcz = cx // B, cy // B, cz // B
    lx, ly, lz = cx - bcx * B, cy - bcy * B, cz - bcz * B
    bflat = (bcx * nby + bcy) * nbz + bcz
    bslot = table.block_map[bflat]
    found = inside & (bslot >= 0)
    slots = jnp.where(found, bslot * BLOCK_SLOTS + (lx * B + ly) * B + lz, 0)
    return slots, found
