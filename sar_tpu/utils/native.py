"""ctypes bindings for the native (C++) runtime components.

Builds native/libsar_native.so on first use (g++, cached); callers fall back
to pure-numpy implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsar_native.so"
_lib = None
_tried = False


_SOURCES = ("edit_distance.cpp", "resample.cpp", "dtw.cpp")


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    srcs = [_NATIVE_DIR / s for s in _SOURCES]
    try:
        stale = (not _LIB_PATH.exists()
                 or any(_LIB_PATH.stat().st_mtime < s.stat().st_mtime
                        for s in srcs))
        if stale:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(_LIB_PATH)] + [str(s) for s in srcs],
                check=True, capture_output=True, timeout=120)
            logger.info("built %s", _LIB_PATH)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.edit_distance_i32.restype = ctypes.c_int64
        lib.edit_distance_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.batch_edit_distance_i32.restype = None
        lib.batch_edit_distance_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.resample_poly_f32.restype = ctypes.c_int64
        lib.resample_poly_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.dtw_path_f32.restype = ctypes.c_int64
        lib.dtw_path_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        _lib = lib
    except Exception as e:  # no compiler / unwritable dir -> numpy fallback
        logger.info("native components unavailable (%s); using numpy", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _csr(seqs: list[np.ndarray]):
    off = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=off[1:])
    flat = (np.concatenate(seqs) if seqs and off[-1] > 0
            else np.zeros(0, np.int32)).astype(np.int32)
    return flat, off


def batch_edit_distance(a_seqs: list[np.ndarray],
                        b_seqs: list[np.ndarray]) -> np.ndarray | None:
    """Batch Levenshtein over int32 id sequences; None if native lib missing."""
    lib = _load()
    if lib is None:
        return None
    a_flat, a_off = _csr(a_seqs)
    b_flat, b_off = _csr(b_seqs)
    out = np.zeros(len(a_seqs), np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.batch_edit_distance_i32(
        a_flat.ctypes.data_as(i32p), a_off.ctypes.data_as(i64p),
        b_flat.ctypes.data_as(i32p), b_off.ctypes.data_as(i64p),
        len(a_seqs), out.ctypes.data_as(i64p))
    return out


def dtw(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Monotone min-cost DTW path through cost[N, M] (native/dtw.cpp);
    returns (row_indices, col_indices) in forward order, or None if the
    native lib is missing (callers fall back to the numpy DP —
    sar_tpu.decode.align._dtw_numpy, same tie-breaking)."""
    lib = _load()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float32)
    n, m = cost.shape
    cap = n + m
    ti = np.empty(cap, np.int32)
    tj = np.empty(cap, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    ln = lib.dtw_path_f32(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
        ti.ctypes.data_as(i32p), tj.ctypes.data_as(i32p), cap)
    if ln < 0:
        return None
    return ti[:ln], tj[:ln]


def resample_poly(audio: np.ndarray, taps: np.ndarray, L: int,
                  M: int) -> np.ndarray | None:
    """Polyphase rational resample (native/resample.cpp): computes
    `convolve(zero_stuff_L(audio) * L, taps, "same")[::M]` touching only the
    ~n_taps/L taps that overlap each output sample. None if the native lib
    is missing (callers fall back to the numpy convolution)."""
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, np.float32)
    taps = np.ascontiguousarray(taps, np.float64)
    n_out = (len(audio) * L + M - 1) // M
    out = np.empty(n_out, np.float32)
    wrote = lib.resample_poly_f32(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(taps),
        L, M, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    return out if wrote == n_out else None
