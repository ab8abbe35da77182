"""ctypes bindings for the native host runtime (with NumPy fallbacks).

The compute path is JAX/XLA/Pallas on TPU; this library accelerates the
host-side runtime around it — negative sampling, Pallas chunk packing,
raw edge-list parsing. If the shared object is missing it is built on
first use when a toolchain is present; callers always have pure-Python
fallbacks, so ``available()`` gating is advisory.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "_tmgcn_native.so"
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _SO.exists():
        try:
            from tmgcn_tpu.native.build import build

            build(verbose=False)
        except Exception:
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _load_failed = True
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)

    lib.tmgcn_sample_negatives.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, i32p, i32p,
    ]
    lib.tmgcn_sample_negatives.restype = None
    lib.tmgcn_pack_count.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
    ]
    lib.tmgcn_pack_count.restype = ctypes.c_int64
    lib.tmgcn_pack_fill.argtypes = [
        i64p, i64p, f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, i32p, i32p, f64p, i32p, i32p,
    ]
    lib.tmgcn_pack_fill.restype = None
    lib.tmgcn_parse_edges.argtypes = [
        ctypes.c_char_p, i32p, ctypes.c_int32, ctypes.c_char,
        ctypes.c_int32, ctypes.c_char, f64p, ctypes.c_int64,
    ]
    lib.tmgcn_parse_edges.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def sample_negatives(
    real_keys: np.ndarray, n_nodes: int, to_add: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Uniform (src, dst) pairs avoiding the given real-edge keys."""
    lib = _load()
    assert lib is not None
    real_keys = np.ascontiguousarray(real_keys, dtype=np.int64)
    src = np.empty(to_add, np.int32)
    dst = np.empty(to_add, np.int32)
    lib.tmgcn_sample_negatives(
        _ptr(real_keys, ctypes.c_int64), len(real_keys), n_nodes, to_add,
        np.uint64(seed), _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
    )
    return src, dst


def pack_chunks(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
    window: int, chunk: int, n_windows: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Windowed chunk packing (see kernels.spmm_pallas.pack_windowed)."""
    lib = _load()
    assert lib is not None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    n = len(rows)
    J = int(lib.tmgcn_pack_count(_ptr(rows, ctypes.c_int64), n, window, chunk, n_windows))
    out_rows = np.empty((J, chunk), np.int32)
    out_cols = np.empty((J, chunk), np.int32)
    out_vals = np.empty((J, chunk), np.float64)
    out_wid = np.empty(J, np.int32)
    out_first = np.empty(J, np.int32)
    lib.tmgcn_pack_fill(
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
        _ptr(vals, ctypes.c_double), n, window, chunk, n_windows, J,
        _ptr(out_rows, ctypes.c_int32), _ptr(out_cols, ctypes.c_int32),
        _ptr(out_vals, ctypes.c_double), _ptr(out_wid, ctypes.c_int32),
        _ptr(out_first, ctypes.c_int32),
    )
    return out_rows, out_cols, out_vals, out_wid, out_first


def parse_edges(
    path: str, columns, delimiter: str | None, skiprows: int, comment: str
) -> np.ndarray:
    """Parse numeric edge-list rows; returns (n_rows, len(columns)) f64."""
    lib = _load()
    assert lib is not None
    cols = np.asarray(columns, np.int32)
    delim = (delimiter or " ").encode()[0]
    com = (comment or "#").encode()[0]
    n = int(
        lib.tmgcn_parse_edges(
            str(path).encode(), _ptr(cols, ctypes.c_int32), len(cols),
            delim, skiprows, com, None, 0,
        )
    )
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, len(cols)), np.float64)
    lib.tmgcn_parse_edges(
        str(path).encode(), _ptr(cols, ctypes.c_int32), len(cols),
        delim, skiprows, com, _ptr(out, ctypes.c_double), n,
    )
    return out
