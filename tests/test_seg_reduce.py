"""Pallas segmented-reduce kernel vs numpy oracle (interpret mode on CPU).

The kernel replaces the cumsum + compaction-sort segment reduction of the
fuse pipeline (fusion._cellsort_reduce); these tests pin its semantics:
exact int sums, f32 segment sums, key-ordered compaction, overflow
accounting, cross-tile carries, two-key segments.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bnv_fusion_tpu.kernels.seg_reduce import (seg_reduce_sorted,
                                               seg_reduce_sorted_ref)


def _random_case(rng, B, M, n_int, n_float, sent, n_keys, frac_valid=0.8,
                 max_run=9):
    keys = np.full((B, M), sent, np.int32)
    cnts = np.zeros((B, n_int, M), np.int32)
    vals = np.zeros((B, n_float, M), np.float32)
    for b in range(B):
        n_valid = int(M * frac_valid)
        ks = np.sort(rng.choice(n_keys, size=n_valid // 2, replace=False))
        runs = rng.randint(1, max_run, size=ks.shape[0])
        flat = np.repeat(ks, runs)[:n_valid]
        keys[b, :len(flat)] = flat
        cnts[b, :, :len(flat)] = rng.randint(0, 100,
                                             size=(n_int, len(flat)))
        vals[b, :, :len(flat)] = rng.randn(n_float, len(flat)).astype(
            np.float32)
    return keys, cnts, vals


@pytest.mark.parametrize("B,M,u,tile", [(1, 4096, 1024, 512),
                                        (2, 2048, 512, 512),
                                        (8, 1024, 512, 256),
                                        (1, 2500, 2048, 512)])
def test_matches_oracle(rng, B, M, u, tile):
    sent = 10_000
    keys, cnts, vals = _random_case(rng, B, M, 2, 3, sent, n_keys=sent)
    ku, _, cu, su, ns = seg_reduce_sorted(
        jnp.asarray(keys), jnp.asarray(cnts), jnp.asarray(vals), u=u,
        sent=sent, tile=tile, interpret=True)
    rku, _, rcu, rsu, rns = seg_reduce_sorted_ref(keys, cnts, vals, u, sent)
    np.testing.assert_array_equal(np.asarray(ns), rns)
    for b in range(B):
        n = min(int(rns[b]), u)
        np.testing.assert_array_equal(np.asarray(ku)[b, :n], rku[b, :n])
        np.testing.assert_array_equal(np.asarray(cu)[b, :n], rcu[b, :n])
        np.testing.assert_allclose(np.asarray(su)[b, :n], rsu[b, :n],
                                   rtol=1e-5, atol=1e-5)


def test_segment_spanning_many_tiles(rng):
    # one giant segment across several tiles + singletons around it
    M, tile, sent = 2048, 256, 1 << 20
    keys = np.concatenate([
        np.arange(100, dtype=np.int32),
        np.full(1500, 500, np.int32),
        np.arange(1000, 1000 + 448, dtype=np.int32)])[None]
    cnts = rng.randint(0, 5, size=(1, 1, M)).astype(np.int32)
    vals = rng.randn(1, 2, M).astype(np.float32)
    ku, _, cu, su, ns = seg_reduce_sorted(
        jnp.asarray(keys), jnp.asarray(cnts), jnp.asarray(vals),
        u=1024, sent=sent, tile=tile, interpret=True)
    rku, _, rcu, rsu, rns = seg_reduce_sorted_ref(keys, cnts, vals, 1024,
                                                  sent)
    np.testing.assert_array_equal(np.asarray(ns), rns)
    n = int(rns[0])
    np.testing.assert_array_equal(np.asarray(ku)[0, :n], rku[0, :n])
    np.testing.assert_array_equal(np.asarray(cu)[0, :n], rcu[0, :n])
    np.testing.assert_allclose(np.asarray(su)[0, :n], rsu[0, :n],
                               rtol=1e-5, atol=1e-5)


def test_overflow_keeps_first_u(rng):
    M, tile, sent, u = 1024, 256, 1 << 16, 64
    keys = np.arange(M, dtype=np.int32)[None]  # every row its own segment
    cnts = np.ones((1, 1, M), np.int32)
    vals = rng.randn(1, 1, M).astype(np.float32)
    ku, _, cu, su, ns = seg_reduce_sorted(
        jnp.asarray(keys), jnp.asarray(cnts), jnp.asarray(vals), u=u,
        sent=sent, tile=tile, interpret=True)
    assert int(ns[0]) == M  # total count includes dropped segments
    np.testing.assert_array_equal(np.asarray(ku)[0], np.arange(u))
    np.testing.assert_allclose(np.asarray(su)[0, :, 0], vals[0, 0, :u],
                               rtol=1e-6)


def test_two_keys(rng):
    M, tile, sent = 1024, 256, 1 << 16
    base = np.sort(rng.choice(1000, size=300, replace=True)).astype(np.int32)
    sub = rng.randint(0, 3, size=300).astype(np.int32)
    order = np.lexsort((sub, base))
    keys = np.full((1, M), sent, np.int32)
    keys2 = np.zeros((1, M), np.int32)
    keys[0, :300] = base[order]
    keys2[0, :300] = sub[order]
    cnts = np.zeros((1, 1, M), np.int32)
    vals = np.zeros((1, 2, M), np.float32)
    cnts[0, :, :300] = rng.randint(0, 10, size=(1, 300))
    vals[0, :, :300] = rng.randn(2, 300).astype(np.float32)
    ku, k2u, cu, su, ns = seg_reduce_sorted(
        jnp.asarray(keys), jnp.asarray(cnts), jnp.asarray(vals), u=512,
        sent=sent, keys2=jnp.asarray(keys2), tile=tile, interpret=True,
        two_keys=True)
    rku, rk2u, rcu, rsu, rns = seg_reduce_sorted_ref(
        keys, cnts, vals, 512, sent, keys2=keys2)
    np.testing.assert_array_equal(np.asarray(ns), rns)
    n = int(rns[0])
    np.testing.assert_array_equal(np.asarray(ku)[0, :n], rku[0, :n])
    np.testing.assert_array_equal(np.asarray(k2u)[0, :n], rk2u[0, :n])
    np.testing.assert_array_equal(np.asarray(cu)[0, :n], rcu[0, :n])
    np.testing.assert_allclose(np.asarray(su)[0, :n], rsu[0, :n],
                               rtol=1e-5, atol=1e-5)


def test_all_sentinel(rng):
    M, tile, sent = 512, 256, 100
    keys = np.full((1, M), sent, np.int32)
    cnts = np.zeros((1, 1, M), np.int32)
    vals = np.zeros((1, 1, M), np.float32)
    ku, _, cu, su, ns = seg_reduce_sorted(
        jnp.asarray(keys), jnp.asarray(cnts), jnp.asarray(vals), u=16,
        sent=sent, tile=tile, interpret=True)
    assert int(ns[0]) == 0
