"""Native (C++) runtime components, loaded via ctypes.

Builds on first use with the system compiler (g++/cc); every consumer has a
pure-numpy fallback, so the framework works without a toolchain too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "mesh_ops.cpp")
        lib_path = os.path.join(here, "libmesh_ops.so")
        try:
            if (not os.path.exists(lib_path) or
                    os.path.getmtime(lib_path) < os.path.getmtime(src)):
                subprocess.run(
                    ["c++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     src, "-o", lib_path],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(lib_path)
            lib.mesh_ops_marching_tets.restype = ctypes.c_int64
            lib.mesh_ops_marching_tets.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_double]
            lib.mesh_ops_marching_tets_indexed.restype = ctypes.c_int64
            lib.mesh_ops_marching_tets_indexed.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int, ctypes.c_float,
                ctypes.c_double]
            lib.mesh_ops_num_vertices.restype = ctypes.c_int64
            lib.mesh_ops_get.argtypes = [ctypes.POINTER(ctypes.c_float),
                                         ctypes.POINTER(ctypes.c_int32)]
            lib.mesh_ops_get_face_cells.argtypes = [
                ctypes.POINTER(ctypes.c_int64)]
            lib.mesh_ops_build_lattice.restype = ctypes.c_int64
            lib.mesh_ops_build_lattice.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int]
            lib.mesh_ops_lattice_num_points.restype = ctypes.c_int64
            lib.mesh_ops_lattice_get.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            _LIB = lib
        except Exception:
            _BUILD_FAILED = True
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def marching_tetrahedra_native(cell_origins: np.ndarray,
                               cell_sdf: np.ndarray,
                               weld_tol: float = 0.0):
    """C++ marching tetrahedra over sparse cells, with optional in-pass weld.

    Returns (vertices [V,3] float32 in lattice units, faces [F,3] int32) or
    None when the native library is unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        return None
    origins = np.ascontiguousarray(cell_origins, np.int64)
    sdf = np.ascontiguousarray(cell_sdf, np.float32)
    with _LOCK:
        n_faces = lib.mesh_ops_marching_tets(
            origins.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(origins), float(weld_tol))
        n_verts = lib.mesh_ops_num_vertices()
        verts = np.empty((n_verts, 3), np.float32)
        faces = np.empty((n_faces, 3), np.int32)
        if n_verts:
            lib.mesh_ops_get(
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        lib.mesh_ops_free()
    return verts, faces


def marching_tetrahedra_indexed_native(cells: np.ndarray,
                                       corner_idx: np.ndarray,
                                       sdf: np.ndarray,
                                       use_sentinel: bool,
                                       nan_fallback: float,
                                       weld_tol: float = 0.0,
                                       return_cell_ids: bool = False):
    """Fused gather + observed-crossing gate + marching tetrahedra.

    Replaces mesh.extract_mesh's numpy block (``sdf[corner_idx]`` gather,
    NaN observation mask, crossing compaction) with one C++ streaming pass
    over ALL lattice cells.  With ``use_sentinel`` a cell meshes only when
    its non-NaN corners cross the level set; NaN corners interpolate as
    ``nan_fallback`` (mesh.py mask_sentinel semantics).  Returns
    (vertices [V,3] float32 lattice units, faces [F,3] int32) or None when
    the native library is unavailable.  With ``return_cell_ids``, a third
    array [F] int64 gives each face's source index into ``cells`` (the
    incremental mesher keys its triangle cache by cell).
    """
    lib = _build_and_load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, np.int64)
    corner_idx = np.ascontiguousarray(corner_idx, np.int64)
    sdf = np.ascontiguousarray(sdf, np.float32)
    with _LOCK:
        n_faces = lib.mesh_ops_marching_tets_indexed(
            cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            corner_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(cells), int(bool(use_sentinel)), float(nan_fallback),
            float(weld_tol))
        n_verts = lib.mesh_ops_num_vertices()
        verts = np.empty((n_verts, 3), np.float32)
        faces = np.empty((n_faces, 3), np.int32)
        face_cells = np.empty((n_faces,), np.int64)
        if n_verts:
            lib.mesh_ops_get(
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if return_cell_ids:
                lib.mesh_ops_get_face_cells(
                    face_cells.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int64)))
        lib.mesh_ops_free()
    if return_cell_ids:
        return verts, faces, face_cells
    return verts, faces


def build_sample_lattice_native(active_coords: np.ndarray, scale: int = 2):
    """C++ twin of mesh.build_sample_lattice (bit-identical output order).

    Radix-sorted key dedup + linear merge-walk corner lookup; avoids the
    numpy path's large broadcast temporaries (page-fault bound on the
    single-core host — RESULTS.md round 3).  Returns (points [P,3] int64,
    corner_idx [M,8] int64, cells [M,3] int64) or None when the native
    library is unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(active_coords, np.int64)
    with _LOCK:
        m = lib.mesh_ops_build_lattice(
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(coords), int(scale))
        p = lib.mesh_ops_lattice_num_points()
        points = np.empty((p, 3), np.int64)
        corner_idx = np.empty((m, 8), np.int64)
        cells = np.empty((m, 3), np.int64)
        if p:
            lib.mesh_ops_lattice_get(
                points.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                corner_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        lib.mesh_ops_lattice_free()
    return points, corner_idx, cells
