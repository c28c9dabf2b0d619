"""Fixed-capacity sparse voxel table: an open-addressing hash in device arrays.

TPU-native replacement for Open3D's GPU HashMap that backs the reference's
SparseVolume (reference src/models/sparse_volume.py:484-892).  The reference
does pointer-chasing inserts/finds through dlpack bridges; here the table is
four plain arrays living in HBM and every operation is a fixed-shape batched
XLA program (gathers, scatters, lax.fori_loop over probe rounds), so the whole
per-frame fusion step jit-compiles once.

Design:
* keys [C, 3] int32 voxel-corner coords, (-1,-1,-1) = empty; values are
  features [C, F], weights [C], num_hits [C].  Slot 0..C-1; C a power of two.
* linear probing with a 3-int mix hash; insertion uses deterministic
  "claim rounds": each pending key proposes its next probe slot, conflicts on
  a slot are resolved by scatter-min of the query index, winners write their
  key, duplicates of the winner resolve in the same round.  Slots are never
  deleted, so lookups that probe the same sequence are exact.
* a batch insert of M keys costs O(MAX_PROBE) gathers+scatters of size M —
  no sorting, no uniqueness pass, no host round-trips.

Multi-chip: the table is replicated; frame points / rays are sharded and
per-slot accumulators combine with psum (see bnv_fusion_tpu.parallel).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

MAX_PROBE = 32
# the alternative STATIC probe budget (``unroll=True``): a python-unrolled
# 12-round double-hash sweep with no lax.while_loop.  Round-3 measurement
# (profiling/probe_hash_table.py, 131k keys into 512k slots on v5e):
# while_loop insert 97 ms / unrolled 135 ms, lookups ~equal (37-39 ms),
# and the unrolled insert costs a 343 s compile — so the while_loop stays
# the default on every backend; the unrolled sweep remains for programs
# where a dynamic loop pessimizes the surrounding jit (the round-1 fuse
# hot path symptom, not reproduced in isolation).
UNROLL_PROBE = 12


def _unrolled_default() -> bool:
    return False

# plain ints: creating jnp scalars at import time would initialize the backend
_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D


class SparseVoxelTable(struct.PyTreeNode):
    """Hash table state (a pytree; capacity/feat dims are array shapes)."""

    keys: jnp.ndarray        # [C, 3] int32, -1 = empty
    features: jnp.ndarray    # [C, F] float32
    weights: jnp.ndarray     # [C] float32 (accumulated fusion weights)
    num_hits: jnp.ndarray    # [C] float32
    overflow: jnp.ndarray    # [] int32 — keys dropped after MAX_PROBE rounds

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def feat_dims(self) -> int:
        return self.features.shape[1]


def create_table(capacity: int, feat_dims: int) -> SparseVoxelTable:
    if capacity & (capacity - 1):
        raise ValueError("capacity must be a power of two")
    return SparseVoxelTable(
        keys=jnp.full((capacity, 3), -1, jnp.int32),
        features=jnp.zeros((capacity, feat_dims), jnp.float32),
        weights=jnp.zeros((capacity,), jnp.float32),
        num_hits=jnp.zeros((capacity,), jnp.float32),
        overflow=jnp.zeros((), jnp.int32),
    )


def _hash_coords(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Mix-hash [..., 3] int32 coords into [0, capacity) slot indices."""
    p1 = jnp.uint32(_P1)
    p2 = jnp.uint32(_P2)
    p3 = jnp.uint32(_P3)
    x = coords[..., 0].astype(jnp.uint32) * p1
    y = coords[..., 1].astype(jnp.uint32) * p2
    z = coords[..., 2].astype(jnp.uint32) * p3
    h = x ^ (y + p1 + (x << 6) + (x >> 2))
    h = h ^ (z + p2 + (h << 6) + (h >> 2))
    return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _probe_stride(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Odd double-hash stride (full cycle over a pow2 capacity): linear
    probing clusters past the static UNROLL_PROBE budget at moderate load
    factors; double hashing keeps the probe sequences independent."""
    p3 = jnp.uint32(_P3)
    x = coords[..., 0].astype(jnp.uint32) * jnp.uint32(_P2)
    y = coords[..., 1].astype(jnp.uint32) * jnp.uint32(_P3)
    z = coords[..., 2].astype(jnp.uint32) * jnp.uint32(_P1)
    h = (x ^ (y >> 3) ^ (z << 5)) + p3
    return ((h | jnp.uint32(1)) & jnp.uint32(capacity - 1)).astype(jnp.int32)


def lookup(table: SparseVoxelTable, query: jnp.ndarray,
           valid: jnp.ndarray | None = None,
           unroll: bool | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find slots for [M, 3] int32 keys.

    Returns (slots [M] int32 — arbitrary where not found, found [M] bool).
    Replaces HashMap.find (reference src/models/sparse_volume.py:681-695);
    missing keys behave as zero-valued entries at the caller.

    ``unroll`` (default: auto by backend) selects the probe strategy: on CPU
    an early-exit while_loop over up to MAX_PROBE rounds; on TPU a static
    UNROLL_PROBE-round sweep (dynamic loops are catastrophically slow on
    the target runtime — measured in RESULTS.md).
    """
    cap = table.capacity
    h0 = _hash_coords(query, cap)
    stride = _probe_stride(query, cap)
    m = query.shape[0]
    slots = jnp.zeros((m,), jnp.int32)
    found = jnp.zeros((m,), bool)
    done = jnp.zeros((m,), bool)
    if valid is not None:
        done = ~valid
    if unroll is None:
        unroll = _unrolled_default()

    def body(state):
        i, slots, found, done = state
        cand = (h0 + i * stride) & (cap - 1)
        k = table.keys[cand]                      # [M, 3] gather
        is_match = jnp.all(k == query, axis=-1) & ~done
        is_empty = (k[:, 0] < 0) & ~done
        slots = jnp.where(is_match, cand, slots)
        found = found | is_match
        done = done | is_match | is_empty
        return i + 1, slots, found, done

    if unroll:
        state = (jnp.int32(0), slots, found, done)
        for _ in range(UNROLL_PROBE):
            state = body(state)
        _, slots, found, _ = state
        return slots, found

    def cond(state):
        i, _, _, done = state
        return (i < MAX_PROBE) & jnp.any(~done)

    # early-exit: at sane load factors almost every key resolves in 1-2
    # probes, so a while_loop beats a fixed MAX_PROBE sweep by ~10x HBM traffic
    _, slots, found, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), slots, found, done))
    return slots, found


def insert(table: SparseVoxelTable, new_keys: jnp.ndarray,
           valid: jnp.ndarray, unroll: bool | None = None
           ) -> Tuple[SparseVoxelTable, jnp.ndarray, jnp.ndarray]:
    """Insert-or-find [M, 3] keys (duplicates allowed); values untouched.

    Returns (table, slots [M] int32, ok [M] bool).  ``ok`` is False for
    invalid entries and for keys dropped after the probe budget (counted in
    table.overflow).  Replaces HashMap.insert + the overwrite path
    (reference src/models/sparse_volume.py:573-585), except values are
    updated separately via scatter (see apply_fusion_update).

    Probe strategy as in ``lookup``: while_loop on CPU, a static
    UNROLL_PROBE-round sweep on TPU.
    """
    cap = table.capacity
    m = new_keys.shape[0]
    h0 = _hash_coords(new_keys, cap)
    stride = _probe_stride(new_keys, cap)
    ticket = jnp.arange(m, dtype=jnp.int32)

    keys = table.keys
    slots = jnp.zeros((m,), jnp.int32)
    pending = valid
    resolved = jnp.zeros((m,), bool)
    if unroll is None:
        unroll = _unrolled_default()

    def round_cond(state):
        i, _, _, pending, _ = state
        return (i < MAX_PROBE) & jnp.any(pending)

    def round_body(state):
        i, keys, slots, pending, resolved = state
        cand = (h0 + i * stride) & (cap - 1)
        k = keys[cand]
        # phase 1: match existing
        is_match = jnp.all(k == new_keys, axis=-1) & pending
        slots = jnp.where(is_match, cand, slots)
        resolved = resolved | is_match
        pending = pending & ~is_match
        # phase 2: claim empty slots (deterministic winner = smallest ticket)
        is_empty = (k[:, 0] < 0)
        want = pending & is_empty
        claim = jnp.full((cap,), m, jnp.int32)
        claim = claim.at[cand].min(jnp.where(want, ticket, m))
        winner = want & (claim[cand] == ticket)
        write_idx = jnp.where(winner, cand, cap)  # losers write out of bounds
        keys = keys.at[write_idx].set(new_keys, mode="drop")
        # phase 3: re-check — winners and their duplicates resolve now
        k2 = keys[cand]
        is_match2 = jnp.all(k2 == new_keys, axis=-1) & pending
        slots = jnp.where(is_match2, cand, slots)
        resolved = resolved | is_match2
        pending = pending & ~is_match2
        return i + 1, keys, slots, pending, resolved

    if unroll:
        state = (jnp.int32(0), keys, slots, pending, resolved)
        for _ in range(UNROLL_PROBE):
            state = round_body(state)
        _, keys, slots, pending, resolved = state
    else:
        _, keys, slots, pending, resolved = jax.lax.while_loop(
            round_cond, round_body,
            (jnp.int32(0), keys, slots, pending, resolved))

    overflow = table.overflow + jnp.sum(pending).astype(jnp.int32)
    return table.replace(keys=keys, overflow=overflow), slots, resolved


def occupancy(table: SparseVoxelTable) -> jnp.ndarray:
    """Number of occupied slots (device scalar)."""
    return jnp.sum(table.keys[:, 0] >= 0)


def gather_values(table: SparseVoxelTable, slots: jnp.ndarray,
                  found: jnp.ndarray):
    """Gather (features, weights, num_hits) with zeros where not found.

    Mirrors SparseVolume.query's zero default
    (reference src/models/sparse_volume.py:661-695).
    """
    f = jnp.where(found[:, None], table.features[slots], 0.0)
    w = jnp.where(found, table.weights[slots], 0.0)
    h = jnp.where(found, table.num_hits[slots], 0.0)
    return f, w, h


def active_entries(table: SparseVoxelTable, with_features: bool = True):
    """Host-side extraction of occupied entries (coords, feats, weights, hits).

    Equivalent to SparseVolume.to_tensor
    (reference src/models/sparse_volume.py:525-559); used at mesh-extraction
    and save time, where a host hop happens anyway.  ``with_features=False``
    skips the feature fetch (features=None) for consumers that only gate on
    keys/weights/hits (mesh extraction).
    """
    import numpy as np

    keys = np.asarray(table.keys)
    mask = keys[:, 0] >= 0
    idx = np.nonzero(mask)[0]
    feats = np.asarray(table.features)[idx] if with_features else None
    return (keys[idx], feats,
            np.asarray(table.weights)[idx], np.asarray(table.num_hits)[idx],
            idx)


def load_entries(capacity: int, coords, features, weights, num_hits
                 ) -> SparseVoxelTable:
    """Rebuild a table from saved active entries (SparseVolume.load analog)."""
    feat_dims = features.shape[1]
    table = create_table(capacity, feat_dims)
    coords = jnp.asarray(coords, jnp.int32)
    valid = jnp.ones((coords.shape[0],), bool)
    table, slots, ok = insert(table, coords, valid)
    table = table.replace(
        features=table.features.at[slots].set(jnp.asarray(features)),
        weights=table.weights.at[slots].set(jnp.asarray(weights).reshape(-1)),
        num_hits=table.num_hits.at[slots].set(jnp.asarray(num_hits).reshape(-1)),
    )
    return table
