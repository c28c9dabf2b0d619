"""Fused segmented reduction over sorted keys (Pallas, TPU).

The sort-reduce fuse pipeline (bnv_fusion_tpu.fusion) repeatedly needs

    sorted keys -> per-segment sums, compacted to a static width

which pure XLA expresses as  global cumsum  +  boundary diff  +  a second
sort for compaction  (fusion._cellsort_reduce) — measured 4-5.5 ms per
480x640 frame per reduction on v5e, dominated by the log-stage cumsum over
the [M, C] payload and the [M]-row compaction sort.  This kernel streams
the data ONCE: a sequential grid walks 2048-row tiles, keeps the running
(open segment) carry in scratch, and writes each tile's finished segments
to the output at a dynamic offset — one pass over the payload instead of
~20 (cumsum) + ~200 (bitonic sort) stages.

Role in the reference: the torch_scatter scatter_mean reduction of
encode_pointcloud (reference src/models/fusion/local_point_fusion.py:116-125)
— here as a TPU kernel over pre-sorted streams.

Layout: payload rides FEATURE-MAJOR ([C, M]: rows on the 128-lane axis) so
the per-tile scans run lane-dense; the [M, C] row-major form would pad C=10
channels to 128 lanes and waste ~12x VPU throughput (the same padding tax
measured in RESULTS.md round 2).

Key algorithmic pieces (all vectorized, no data-dependent control flow):
* segmented inclusive scan: log2(T) rounds of  shift + masked add  with
  boundary-flag propagation (Blelloch),
* cross-tile carry: payloads of invalid (sentinel) rows are zero by
  caller contract, so the carry needs no open/closed flag — a segment
  spanning tiles accumulates through the scratch carry and is emitted by
  the tile that sees its true end (the neighbour tiles' boundary keys are
  scalar-prefetched),
* stable stream compaction WITHOUT a sort: ends move to the front by
  their shift amount a[i] = i - rank(i), one conditional jump per bit of
  a.  Monotone non-decreasing shifts guarantee no collisions at any
  round (masked-shift monotonicity: writing a = q*2^(k+1) + r, q is
  non-decreasing, so partial shifts preserve strict output order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048


def _shift_right(x, d, fill):
    """x[i] <- x[i-d] along the last (lane) axis; first d lanes <- fill."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    return jnp.where(lane >= d, pltpu.roll(x, d, axis=len(x.shape) - 1), fill)


def _shift_left(x, d, fill):
    """x[i] <- x[i+d] along the last (lane) axis; last d lanes <- fill."""
    t = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    # pltpu.roll requires a non-negative shift: left-by-d == right-by-(t-d)
    return jnp.where(lane < t - d, pltpu.roll(x, t - d, axis=len(x.shape) - 1),
                     fill)


def _kernel(nextk_ref, prevk_ref,           # scalar-prefetch [B, G]
            keys_ref, keys2_ref, cnts_ref, vals_ref,    # tiles
            out_ref, n_ref,                 # outputs
            stage_ref, carry_f_ref, carry_i_ref, smem, sem,
            *, tile, n_int, n_float, u_width, sent, two_keys):
    b = pl.program_id(0)
    g = pl.program_id(1)
    t = tile

    @pl.when(g == 0)
    def _init():
        smem[0] = 0                      # output row offset (clamped)
        smem[1] = 0                      # total segments seen
        carry_f_ref[...] = jnp.zeros_like(carry_f_ref)
        carry_i_ref[...] = jnp.zeros_like(carry_i_ref)

    k = keys_ref[0]                      # (1, T) i32
    ci = cnts_ref[0]                     # (n_int, T) i32
    vf = vals_ref[0]                     # (n_float, T) f32
    prevk = prevk_ref[b, g]
    nextk = nextk_ref[b, g]

    kprev = _shift_right(k, 1, prevk)
    boundary = (k != kprev)
    if two_keys:
        k2 = keys2_ref[0]
        prevk2 = prevk_ref[b + pl.num_programs(0), g]
        k2prev = _shift_right(k2, 1, prevk2)
        boundary = boundary | (k2 != k2prev)

    # segmented inclusive scan (sums restart at each boundary)
    s_f = vf
    s_i = ci
    flag = boundary.astype(jnp.int32)
    d = 1
    while d < t:
        nb = (flag == 0)                 # no boundary in the covered window
        s_f = s_f + jnp.where(nb, _shift_right(s_f, d, 0.0), 0.0)
        s_i = s_i + jnp.where(nb, _shift_right(s_i, d, 0), 0)
        flag = flag | _shift_right(flag, d, 0)
        d *= 2

    # cross-tile carry folds into the first segment (rows before the first
    # boundary); sentinel-row payloads are zero by contract, so a fresh or
    # sentinel carry adds nothing
    first_seg = (flag == 0)
    s_f = s_f + jnp.where(first_seg, carry_f_ref[...][:, 0:1], 0.0)
    s_i = s_i + jnp.where(first_seg, carry_i_ref[...][:, 0:1], 0)

    valid = k < sent
    knext = _shift_left(k, 1, nextk)
    is_end = valid & (knext != k)
    if two_keys:
        nextk2 = nextk_ref[b + pl.num_programs(0), g]
        k2next = _shift_left(k2, 1, nextk2)
        is_end = valid & ((knext != k) | (k2next != k2))

    # rank of each end among the tile's ends (plain prefix sum)
    e = is_end.astype(jnp.int32)
    p = e
    d = 1
    while d < t:
        p = p + _shift_right(p, d, 0)
        d *= 2
    n_ends = jnp.max(p)                  # scalar: ends in this tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    a = jnp.where(is_end, lane - (p - 1), 0)   # shift distance (monotone)

    # pack output channels as i32: [key, (key2), ints, bitcast floats]
    chans = [k]
    if two_keys:
        chans.append(k2)
    chans += [s_i, jax.lax.bitcast_convert_type(s_f, jnp.int32)]
    x = jnp.concatenate(chans, axis=0)   # (CH, T) i32

    # stable compaction: one conditional jump per bit of the shift amount.
    # A slot RECEIVES the element from i+d when that element's current bit
    # is set, and VACATES its own element when it departed — without the
    # vacate, a stale duplicate keeps routing and can overwrite a settled
    # segment at a later round.
    kbit = 0
    d = 1
    while d < t:
        cand_x = _shift_left(x, d, 0)
        cand_a = _shift_left(a, d, 0)
        take = ((cand_a >> kbit) & 1) == 1
        moved = ((a >> kbit) & 1) == 1
        x = jnp.where(take, cand_x, jnp.where(moved, 0, x))
        a = jnp.where(take, cand_a, jnp.where(moved, 0, a))
        kbit += 1
        d *= 2

    # pad channels to the 128-lane tile: HBM outputs are lane-tiled, so the
    # DMA's minor dim must be a 128 multiple
    ch = x.shape[0]
    if ch < 128:
        x = jnp.concatenate(
            [x, jnp.zeros((128 - ch, t), jnp.int32)], axis=0)
    stage_ref[...] = x.T                 # (T, 128) for row-offset DMA

    off = smem[0]
    copy = pltpu.make_async_copy(
        stage_ref, out_ref.at[b, pl.ds(off, t), :], sem)
    copy.start()

    # bookkeeping for the next tile
    smem[0] = jnp.minimum(off + n_ends, u_width)
    smem[1] = smem[1] + n_ends
    n_ref[0, 0, 0] = smem[1]
    carry_f_ref[...] = s_f[:, t - 1:t]
    carry_i_ref[...] = s_i[:, t - 1:t]
    copy.wait()


@partial(jax.jit, static_argnames=("u", "sent", "tile", "interpret",
                                   "two_keys"))
def seg_reduce_sorted(keys: jnp.ndarray, cnts: jnp.ndarray,
                      vals: jnp.ndarray, u: int, sent: int,
                      keys2: jnp.ndarray | None = None,
                      tile: int = DEFAULT_TILE,
                      interpret: bool = False,
                      two_keys: bool = False):
    """Per-segment sums of a key-sorted stream, compacted to width ``u``.

    Args:
      keys:  [B, M] int32, ascending per batch row; rows with key >= sent
             are padding/invalid and MUST carry all-zero payloads.
      cnts:  [B, n_int, M] int32 integer payload channels (exact sums).
      vals:  [B, n_float, M] float32 payload channels.
      keys2: optional [B, M] secondary key (segment = distinct (key, key2));
             pass two_keys=True.
      u:     static output width (first u segments kept, rest dropped).
      sent:  sentinel threshold (valid keys < sent).

    Returns (keys_u [B,u] i32, keys2_u [B,u] or None, cnts_u [B,u,n_int] i32,
    sums_u [B,u,n_float] f32, n_seg [B] i32 = TOTAL segments incl. dropped).
    Segments are emitted in key order; slots past min(n_seg, u) hold garbage
    (callers mask with arange(u) < n_seg as usual).
    """
    B, M = keys.shape
    n_int = cnts.shape[1]
    n_float = vals.shape[1]
    if M % tile:
        pad = tile - M % tile
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=sent)
        if keys2 is not None:
            keys2 = jnp.pad(keys2, ((0, 0), (0, pad)), constant_values=0)
        cnts = jnp.pad(cnts, ((0, 0), (0, 0), (0, pad)))
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, pad)))
        M += pad
    G = M // tile
    CH = (2 if two_keys else 1) + n_int + n_float
    if CH > 128:
        raise ValueError(f"at most 128 output channels supported, got {CH}")

    # neighbour-tile boundary keys (scalar-prefetched): prev = last key of
    # the previous tile (SENT before the first: any first valid key opens a
    # boundary), next = first key of the next tile (SENT after the last:
    # the final segment ends at the last valid row)
    def edges(kk, first_fill):
        prevk = jnp.concatenate(
            [jnp.full((B, 1), first_fill, jnp.int32),
             kk[:, tile - 1::tile][:, :-1]], axis=1)          # [B, G]
        nk = jnp.concatenate(
            [kk[:, tile::tile], jnp.full((B, 1), sent, jnp.int32)], axis=1)
        return prevk, nk

    prevk, nextk = edges(keys, sent)
    if two_keys:
        p2, n2 = edges(keys2, 0)
        # stacked [2B, G]: rows B.. carry the secondary key's edges
        prevk = jnp.concatenate([prevk, p2], axis=0)
        nextk = jnp.concatenate([nextk, n2], axis=0)
    if keys2 is None:
        keys2 = jnp.zeros_like(keys)

    kern = partial(_kernel, tile=tile, n_int=n_int, n_float=n_float,
                   u_width=u, sent=sent, two_keys=two_keys)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, G),
        in_specs=[
            # keys ride as [B, 1, M]: a (1, tile) block on a [B, M] array
            # violates Mosaic's block rule (dims[-2] must be 8-divisible or
            # equal the array dim) as soon as B > 1
            pl.BlockSpec((1, 1, tile), lambda b, g, *_: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda b, g, *_: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_int, tile), lambda b, g, *_: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_float, tile), lambda b, g, *_: (b, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # explicit HBM: the compacted stream is written by manual DMA at
            # dynamic row offsets; a VMEM placement would tile the 10-wide
            # minor dim to 128 lanes and reject the unaligned slice
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, 1), lambda b, g, *_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.int32),       # transposed staging
            pltpu.VMEM((n_float, 1), jnp.float32),    # float carry
            pltpu.VMEM((n_int, 1), jnp.int32),        # int carry
            pltpu.SMEM((2,), jnp.int32),              # out_off, total
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, n_seg = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, u + tile, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(nextk, prevk,
      keys.reshape(B, 1, M), keys2.reshape(B, 1, M),
      cnts.reshape(B, n_int, M), vals.reshape(B, n_float, M))

    out = out[:, :u, :CH]
    keys_u = out[..., 0]
    base = 1
    keys2_u = None
    if two_keys:
        keys2_u = out[..., 1]
        base = 2
    cnts_u = out[..., base:base + n_int]
    sums_u = jax.lax.bitcast_convert_type(
        out[..., base + n_int:], jnp.float32)
    return keys_u, keys2_u, cnts_u, sums_u, n_seg[:, 0, 0]


def seg_reduce_sorted_ref(keys, cnts, vals, u, sent, keys2=None):
    """Pure-numpy oracle of seg_reduce_sorted (tests)."""
    B, M = keys.shape
    n_int, n_float = cnts.shape[1], vals.shape[1]
    keys = np.asarray(keys)
    keys2 = np.zeros_like(keys) if keys2 is None else np.asarray(keys2)
    cnts, vals = np.asarray(cnts), np.asarray(vals)
    ku = np.zeros((B, u), np.int32)
    k2u = np.zeros((B, u), np.int32)
    cu = np.zeros((B, u, n_int), np.int64)
    su = np.zeros((B, u, n_float), np.float64)
    ns = np.zeros((B,), np.int32)
    for b in range(B):
        segs = []
        i = 0
        while i < M:
            if keys[b, i] >= sent:
                i += 1
                continue
            j = i
            while (j < M and keys[b, j] == keys[b, i]
                   and keys2[b, j] == keys2[b, i]):
                j += 1
            segs.append((keys[b, i], keys2[b, i],
                         cnts[b, :, i:j].sum(1), vals[b, :, i:j].sum(1)))
            i = j
        ns[b] = len(segs)
        for si, (kk, k2, cc, ss) in enumerate(segs[:u]):
            ku[b, si], k2u[b, si] = kk, k2
            cu[b, si], su[b, si] = cc, ss
    return ku, k2u, cu, su, ns
