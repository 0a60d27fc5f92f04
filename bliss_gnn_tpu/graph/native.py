"""ctypes bindings for the native graphcore library (native/graphcore.cpp).

Provides C++ builders for the host-side preprocessing hot spots — canonical
CSC/CSR construction and the banded SpMM layout — with transparent numpy
fallbacks when the shared library is unavailable.  The library is built on
first use with the system compiler (no pip dependencies; see
native/build.sh).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraphcore.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.banded_count_tiles.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def build_csc(
    src: np.ndarray, dst: np.ndarray, n_nodes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(indptr, csc_src, perm) — native counting sort, numpy fallback."""
    lib = load()
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    e = len(src)
    if lib is None:
        order = np.argsort(dst, kind="stable")
        indptr = np.zeros(n_nodes + 1, np.int64)
        np.add.at(indptr, dst[order] + 1, 1)
        np.cumsum(indptr, out=indptr)
        return indptr, src[order], order
    indptr = np.zeros(n_nodes + 1, np.int64)
    csc_src = np.empty(e, np.int64)
    perm = np.empty(e, np.int64)
    lib.build_csc(
        ctypes.c_int64(n_nodes), ctypes.c_int64(e), _i64p(src), _i64p(dst),
        _i64p(indptr), _i64p(csc_src), _i64p(perm),
    )
    return indptr, csc_src, perm


def build_csr_from_csc(
    csc_indptr: np.ndarray, csc_src: np.ndarray, n_nodes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = load()
    csc_indptr = np.ascontiguousarray(csc_indptr, dtype=np.int64)
    csc_src = np.ascontiguousarray(csc_src, dtype=np.int64)
    e = len(csc_src)
    if lib is None:
        dst_of = np.repeat(
            np.arange(n_nodes, dtype=np.int64), np.diff(csc_indptr)
        )
        order = np.argsort(csc_src, kind="stable")
        indptr = np.zeros(n_nodes + 1, np.int64)
        np.add.at(indptr, csc_src[order] + 1, 1)
        np.cumsum(indptr, out=indptr)
        return indptr, dst_of[order], order
    csr_indptr = np.zeros(n_nodes + 1, np.int64)
    csr_dst = np.empty(e, np.int64)
    csr_eid = np.empty(e, np.int64)
    lib.build_csr_from_csc(
        ctypes.c_int64(n_nodes), ctypes.c_int64(e), _i64p(csc_indptr),
        _i64p(csc_src), _i64p(csr_indptr), _i64p(csr_dst), _i64p(csr_eid),
    )
    return csr_indptr, csr_dst, csr_eid


def banded_layout_arrays(
    csc_indptr: np.ndarray,
    csc_src: np.ndarray,
    edge_vals: Optional[np.ndarray],
    band: int,
    wr: int,
    et: int,
):
    """Native two-phase banded layout build; returns the arrays consumed by
    ops.spmm_pallas.BandedLayout, or None when the library is unavailable
    (the caller then uses the numpy path)."""
    lib = load()
    if lib is None:
        return None
    n_nodes = len(csc_indptr) - 1
    n_edges = len(csc_src)
    csc_indptr = np.ascontiguousarray(csc_indptr, dtype=np.int64)
    csc_src = np.ascontiguousarray(csc_src, dtype=np.int64)
    sorted_eid = np.empty(max(n_edges, 1), np.int64)
    n_tiles = lib.banded_count_tiles(
        ctypes.c_int64(n_nodes), ctypes.c_int64(n_edges), _i64p(csc_indptr),
        _i64p(csc_src), ctypes.c_int64(band), ctypes.c_int64(wr),
        ctypes.c_int64(et), _i64p(sorted_eid),
    )
    n_tiles = max(1, int(n_tiles))
    tile_win = np.zeros(n_tiles, np.int32)
    tile_first = np.ones(n_tiles, np.int32)
    tile_band = np.zeros(n_tiles, np.int32)
    src_rel = np.zeros(n_tiles * et, np.int32)
    dst_rel = np.zeros((n_tiles, et), np.int32)
    edge_w = np.zeros((n_tiles, et), np.float32)
    edge_perm = np.full((n_tiles, et), -1, np.int64)
    ev = None
    if edge_vals is not None:
        ev = np.ascontiguousarray(edge_vals, dtype=np.float32)
    lib.banded_fill_tiles(
        ctypes.c_int64(n_nodes), ctypes.c_int64(n_edges), _i64p(csc_indptr),
        _i64p(csc_src),
        _f32p(ev) if ev is not None else None,
        ctypes.c_int64(band), ctypes.c_int64(wr), ctypes.c_int64(et),
        _i64p(sorted_eid), ctypes.c_int64(n_tiles), _i32p(tile_win),
        _i32p(tile_first), _i32p(src_rel), _i32p(dst_rel), _f32p(edge_w),
        _i64p(edge_perm), _i32p(tile_band),
    )
    return dict(
        tile_win=tile_win, tile_first=tile_first, tile_band=tile_band,
        src_rel=src_rel, dst_rel=dst_rel[:, None, :],
        edge_w=edge_w[:, None, :], edge_perm=edge_perm,
    )


def normalized_edata_native(
    csc_indptr: np.ndarray, weights: Optional[np.ndarray], n_edges: int
) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    n_nodes = len(csc_indptr) - 1
    csc_indptr = np.ascontiguousarray(csc_indptr, dtype=np.int64)
    out = np.empty(n_edges, np.float32)
    w = None
    if weights is not None:
        w = np.ascontiguousarray(weights, dtype=np.float32)
    lib.normalized_edata_c(
        ctypes.c_int64(n_nodes), ctypes.c_int64(n_edges), _i64p(csc_indptr),
        _f32p(w) if w is not None else None, _f32p(out),
    )
    return out
