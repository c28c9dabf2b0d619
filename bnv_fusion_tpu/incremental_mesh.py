"""Incremental mesh maintenance for demo-mode periodic extraction.

Rebuilds VolumeList's per-voxel incremental mesh cache (reference
src/models/sparse_volume.py:895-1158: meshlize_coords / merge_meshes /
mesh_indices): demo mode re-extracts the mesh every optim_interval frames
(reference run_e2e.py:270-280), and re-decoding the whole map each time is
wasteful when only recently-touched voxels changed.

The cache keys triangles by their half-lattice cell.  On update:
1. diff the table's weights/features snapshots -> changed slots -> changed
   voxel coords (host-side diff of flat arrays, cheap),
2. re-decode only the sample lattice of changed voxels (+ their 1-voxel
   neighborhood, since a voxel's latent feeds decodes up to one cell away),
3. replace those cells' triangles in the cache (including deletions where
   the surface moved out of a cell).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu.mesh import (Mesh, build_sample_lattice, coord_key3,
                                 marching_tetrahedra, merge_vertices,
                                 pack_weld_keys)

_NEIGHBOR_OFFSETS = np.stack(
    np.meshgrid(*[[-1, 0, 1]] * 3, indexing="ij"), -1).reshape(-1, 3)


class IncrementalMesher:
    def __init__(self, min_coords, voxel_size: float,
                 merge_tol_factor: float = 0.25,
                 batch_size: int = 1 << 18,
                 n_xyz=None, delta_tol: float = 0.0):
        self.min_coords = np.asarray(min_coords)
        self.voxel_size = float(voxel_size)
        self.merge_tol_factor = merge_tol_factor
        self.batch_size = batch_size
        self.n_xyz = None if n_xyz is None else np.asarray(n_xyz, np.int64)
        # prior cells whose value moved more than this re-mesh their voxels
        # (0.0 = exact tracking of every prior change)
        self.delta_tol = float(delta_tol)
        # flat triangle cache: [K, 3, 3] triangle verts (lattice units) +
        # the int64 cell key of each triangle's source half-lattice cell.
        # (Round 5: a dict keyed by cell tuple cost 4-9 s per demo-mode
        # event in python loops — pop over ~1.5M recomputed cells, per-cell
        # inserts, 300k-array concat — where these two arrays update with
        # one searchsorted mask + concat.)
        self._tris = np.zeros((0, 3, 3), np.float32)
        self._tri_keys = np.zeros((0,), np.int64)
        # per-vertex packed weld keys (coord_key3 layout), computed once at
        # append time: _assemble's weld re-derived them from ALL cached
        # triangles every event (round + pack over 5.5M vertices measured
        # 0.6-0.8 s of a 1.1 s assemble); the math is elementwise, so
        # packing each block at insertion is bit-identical
        self._tri_weld = np.zeros((0, 3), np.int64)
        self._weld_ok = True  # False: some block's coords out of packing range
        self._prev_weights: Optional[np.ndarray] = None
        self._prev_features: Optional[np.ndarray] = None
        self._prev_delta: Optional[np.ndarray] = None

    def _changed_slots(self, weights: np.ndarray,
                       features: np.ndarray) -> np.ndarray:
        if self._prev_weights is None:
            changed = np.ones(len(weights), bool)
        else:
            n = min(len(weights), len(self._prev_weights))
            changed = np.zeros(len(weights), bool)
            # exact per-row comparison: a reduced proxy (e.g. feature sums)
            # can alias distinct latents and miss changes
            changed[:n] = (weights[:n] != self._prev_weights[:n]) | \
                (features[:n] != self._prev_features[:n]).any(axis=1)
            changed[n:] = True
        self._prev_weights = weights.copy()
        self._prev_features = features.copy()
        return changed

    def _delta_changed_voxels(self, sdf_delta: Optional[np.ndarray],
                              active_coords: np.ndarray) -> np.ndarray:
        """Voxels whose decode is affected by TSDF-prior changes.

        decode samples the prior at fine-grid corner coords via nearest
        lookup (fusion._sample_delta_nearest); a voxel's samples span its
        coords +-1, which maps to at most +-1 prior cell (the prior is at
        least as coarse as the fine grid), covered by a 2-cell dilation of
        the changed-prior mask."""
        if sdf_delta is None or self.n_xyz is None:
            self._prev_delta = None
            return np.zeros(len(active_coords), bool)
        sdf_delta = np.asarray(sdf_delta)
        prev = self._prev_delta
        self._prev_delta = sdf_delta.copy()
        if prev is None or prev.shape != sdf_delta.shape:
            return np.zeros(len(active_coords), bool)  # first call: all
            # voxels are "changed" via the weights path anyway
        moved = np.abs(sdf_delta - prev) > self.delta_tol
        if not moved.any():
            return np.zeros(len(active_coords), bool)
        from scipy.ndimage import binary_dilation

        moved = binary_dilation(moved, iterations=2)
        dims = np.asarray(sdf_delta.shape, np.float64)
        idx = np.round(active_coords.astype(np.float64) /
                       np.maximum(self.n_xyz - 1, 1) *
                       (dims - 1)).astype(np.int64)
        idx = np.clip(idx, 0, (dims - 1).astype(np.int64))
        return moved[idx[:, 0], idx[:, 1], idx[:, 2]]

    def update(self, decode_fn, active_coords: np.ndarray,
               active_weights: np.ndarray, active_features: np.ndarray,
               min_weight: float,
               sdf_delta: Optional[np.ndarray] = None,
               changed_rows: Optional[np.ndarray] = None) -> Mesh:
        """Refresh the cache and return the merged mesh.

        ``active_*`` are the table's compacted entries in SLOT order (stable
        across calls for the dense table); ``decode_fn`` as in
        mesh.extract_mesh.  ``min_weight`` filters voxels that can mesh.
        ``sdf_delta`` (the dense prior in DECODE units) re-meshes voxels
        whose prior moved even when their latents did not.

        ``changed_rows`` (bool ``[len(active_coords)]``) supplies the
        latent-change mask precomputed elsewhere — the pipeline diffs the
        table ON DEVICE against a snapshot and fetches only this mask, so
        the ``[n, F]`` feature block (the dominant tunnel transfer of an
        event) never leaves the chip; ``active_features`` may be None then.
        """
        prof = os.environ.get("BNV_INC_PROFILE") == "1"
        t0 = time.time()
        if changed_rows is not None:
            changed = np.asarray(changed_rows, bool)
        else:
            changed = self._changed_slots(active_weights, active_features)
        changed |= self._delta_changed_voxels(sdf_delta, active_coords)
        eligible = active_weights >= min_weight
        work = active_coords[changed & eligible]
        if prof:
            print(f"[inc] diff: {time.time()-t0:.2f}s changed "
                  f"{int((changed & eligible).sum())}/{int(eligible.sum())}",
                  flush=True)
            t0 = time.time()
        if len(work) == 0 and len(self._tris):
            return self._assemble()

        # include the 1-voxel neighborhood: a changed latent affects decodes
        # of any cell within one voxel
        if len(work):
            from bnv_fusion_tpu.mesh import coord_unkey3

            grown = (work[:, None, :] + _NEIGHBOR_OFFSETS[None]).reshape(-1, 3)
            # only re-mesh blocks of voxels that are active+eligible —
            # key-based membership (a python set of tuples over the whole
            # map costs seconds at 500k voxels)
            gk = np.unique(coord_key3(grown))
            ak = np.sort(coord_key3(active_coords[eligible]))
            if len(ak) == 0:
                grown = np.zeros((0, 3), np.int64)
            else:
                pos = np.clip(np.searchsorted(ak, gk), 0, len(ak) - 1)
                grown = coord_unkey3(gk[ak[pos] == gk])
        else:
            grown = work.astype(np.int64)
        if len(grown) == 0:
            return self._assemble()
        if prof:
            print(f"[inc] grow: {time.time()-t0:.2f}s grown {len(grown)}",
                  flush=True)
            t0 = time.time()

        points, corner_idx, cells = build_sample_lattice(grown.astype(np.int32))
        coords = points.astype(np.float32) / 2.0
        if prof:
            print(f"[inc] lattice: {time.time()-t0:.2f}s pts {len(points)} "
                  f"cells {len(cells)}", flush=True)
            t0 = time.time()
        # dispatch all batches before fetching (per-batch np.asarray would
        # serialize the dispatch pipeline; see mesh.extract_mesh)
        bs = self.batch_size
        pending = []
        for s in range(0, len(points), bs):
            e = min(s + bs, len(points))
            batch = np.zeros((bs, 3), np.float32)
            batch[: e - s] = coords[s:e]
            pending.append((s, e, decode_fn(jnp.asarray(batch))))
        sdf = np.empty((len(points),), np.float32)
        for s, e, out in pending:
            sdf[s:e] = np.asarray(out)[: e - s]
        if prof:
            print(f"[inc] decode: {time.time()-t0:.2f}s "
                  f"({len(pending)} batches)", flush=True)
            t0 = time.time()

        # marching tets over the recomputed cells with per-face cell ids —
        # the native streaming pass when available (same sentinel semantics
        # as mesh.extract_mesh(mask_sentinel=True)), numpy fallback below
        from bnv_fusion_tpu import native

        nat = native.marching_tetrahedra_indexed_native(
            cells, corner_idx, sdf, use_sentinel=True,
            nan_fallback=self.voxel_size, weld_tol=0.0,
            return_cell_ids=True)
        if prof:
            print(f"[inc]   mc: {time.time()-t0:.2f}s", flush=True)
            t_mc = time.time()
        if nat is not None:
            verts, faces, tri_cell = nat
            new_tris = verts[faces]                       # [K, 3, 3]
            new_keys = coord_key3(cells[tri_cell])
        else:
            cell_sdf = sdf[corner_idx]
            observed = ~np.isnan(cell_sdf)
            obs_min = np.where(observed, cell_sdf, np.inf).min(1)
            obs_max = np.where(observed, cell_sdf, -np.inf).max(1)
            crossing = (obs_min < 0) & (obs_max > 0)
            cell_sdf = np.where(observed, cell_sdf, self.voxel_size)
            out, tri_cell = marching_tetrahedra(cells[crossing],
                                                cell_sdf[crossing],
                                                return_cell_ids=True)
            new_tris = (out.vertices[out.faces] if len(out.vertices)
                        else np.zeros((0, 3, 3), np.float32))
            new_keys = (coord_key3(cells[crossing][tri_cell])
                        if len(new_tris) else np.zeros((0,), np.int64))

        # every recomputed cell gets replaced (or cleared) in the cache:
        # drop all cached triangles whose cell was recomputed, append the
        # fresh ones — one sorted-membership mask, no python loops
        if prof:
            print(f"[inc]   tris build: {time.time()-t_mc:.2f}s "
                  f"new {len(new_tris)}", flush=True)
            t_mc = time.time()
        recomputed = np.sort(coord_key3(cells))
        if len(self._tris) and len(recomputed):
            pos = np.clip(np.searchsorted(recomputed, self._tri_keys),
                          0, len(recomputed) - 1)
            keep = recomputed[pos] != self._tri_keys
            self._tris = self._tris[keep]
            self._tri_keys = self._tri_keys[keep]
            self._tri_weld = self._tri_weld[keep]
        if len(new_tris):
            new_tris = new_tris.astype(np.float32)
            self._tris = np.concatenate([self._tris, new_tris], axis=0)
            self._tri_keys = np.concatenate([self._tri_keys, new_keys])
            packed = pack_weld_keys(
                self._world_verts(new_tris),
                self.voxel_size * self.merge_tol_factor)
            if packed is None:
                self._weld_ok = False
                packed3 = np.zeros((len(new_tris), 3), np.int64)
            else:
                packed3 = packed.reshape(-1, 3)
            self._tri_weld = np.concatenate([self._tri_weld, packed3])
        if prof:
            print(f"[inc] mc+cache: {time.time()-t0:.2f}s "
                  f"tris {len(self._tris)}", flush=True)
            t0 = time.time()
        out = self._assemble()
        if prof:
            print(f"[inc] assemble: {time.time()-t0:.2f}s "
                  f"verts {len(out.vertices)}", flush=True)
        return out

    def _world_verts(self, tris: np.ndarray) -> np.ndarray:
        """Lattice-unit triangle verts -> world-space float32 [3K, 3].

        One shared helper so the per-block weld keys cached at append time
        see bit-identical arithmetic to _assemble's full-cache transform."""
        return (tris.reshape(-1, 3) / 2.0 * self.voxel_size
                + self.min_coords).astype(np.float32)

    def _assemble(self) -> Mesh:
        if not len(self._tris):
            return Mesh(np.zeros((0, 3), np.float32),
                        np.zeros((0, 3), np.int32))
        verts = self._world_verts(self._tris)
        faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        # weld keys were packed per appended block (elementwise math, so
        # bit-identical to packing the whole cache here) — skips the
        # round+pack pass, 0.6-0.8 s of a 1.1 s assemble at 5.5M verts
        packed = self._tri_weld.reshape(-1) if self._weld_ok else None
        return merge_vertices(Mesh(verts, faces),
                              self.voxel_size * self.merge_tol_factor,
                              packed_keys=packed)
