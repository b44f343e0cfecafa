"""ctypes bindings for the native C++ runtime (native/aligntools_native.cpp).

Builds on first use (``make -C native``) and caches the handle; every entry
point has a pure-Python fallback (io/fasta.py, engine/traceback.py), so the
package works without a toolchain — the native path is the performance
default, mirroring the reference's all-C runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaligntools_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=300,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None when unavailable (or disabled
    via ALIGNTOOLS_NO_NATIVE=1 — forces the pure-Python fallbacks)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        if os.environ.get("ALIGNTOOLS_NO_NATIVE"):
            _tried = True
            return None
        _tried = True
        # Always invoke make: its mtime check is a cheap no-op when the
        # .so is current, and guarantees the loaded library matches the
        # sources (the .so is a build artifact, never version-controlled).
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.at_parse.restype = ctypes.c_void_p
        lib.at_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.at_parse_error.restype = ctypes.c_int
        lib.at_parse_error.argtypes = [ctypes.c_void_p]
        lib.at_num_records.restype = ctypes.c_int64
        lib.at_num_records.argtypes = [ctypes.c_void_p]
        lib.at_arena.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.at_arena.argtypes = [ctypes.c_void_p]
        lib.at_arena_size.restype = ctypes.c_int64
        lib.at_arena_size.argtypes = [ctypes.c_void_p]
        lib.at_records_meta.restype = ctypes.POINTER(ctypes.c_int64)
        lib.at_records_meta.argtypes = [ctypes.c_void_p]
        lib.at_free.restype = None
        lib.at_free.argtypes = [ctypes.c_void_p]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.at_traceback_affine.restype = ctypes.c_int64
        lib.at_traceback_affine.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64, u8p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            u8p, u8p,
        ]
        lib.at_traceback_overlap.restype = ctypes.c_int64
        lib.at_traceback_overlap.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64, u8p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, u8p, u8p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# FASTA/FASTQ parsing
# ---------------------------------------------------------------------------


def parse_records_native(path: str, max_records: int = -1):
    """Parse with the C++ kseq-equivalent; returns a list of
    io.fasta.FastaRecord (None comment/qual preserved). Raises OSError on
    open failure. Returns None when the native lib is unavailable."""
    from aligntools_tpu.io.fasta import FastaRecord

    lib = get_lib()
    if lib is None:
        return None
    h = lib.at_parse(path.encode(), max_records)
    try:
        if lib.at_parse_error(h):
            raise OSError(f"cannot open {path}")
        nrec = lib.at_num_records(h)
        if nrec == 0:
            return []
        asize = lib.at_arena_size(h)
        # empty std::vector data() is NULL — never wrap a NULL pointer
        buf = (
            np.ctypeslib.as_array(lib.at_arena(h), shape=(asize,)).tobytes()
            if asize > 0
            else b""
        )
        meta = np.ctypeslib.as_array(lib.at_records_meta(h), shape=(nrec, 8))
        # tolist() once: per-element numpy-scalar int() conversions are
        # ~6x the cost of the slices themselves at millions of records
        out = []
        for (name_off, name_len, c_off, c_len, s_off, s_len, q_off,
             q_len) in meta.tolist():
            out.append(
                FastaRecord(
                    name=buf[name_off : name_off + name_len],
                    comment=(
                        buf[c_off : c_off + c_len] if c_off >= 0 else None
                    ),
                    seq=buf[s_off : s_off + s_len],
                    qual=buf[q_off : q_off + q_len] if q_off >= 0 else None,
                )
            )
        return out
    finally:
        lib.at_free(h)


# ---------------------------------------------------------------------------
# Traceback walks
# ---------------------------------------------------------------------------

_STOP_FIT, _STOP_LOCAL, _STOP_GLOBAL = 0, 1, 2
# start-state ints must match the C constants ST_LOW/ST_MID/ST_UPP = 0/1/2.


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _walk_native(ptrs, q, t, start_state, i, j, stop):
    lib = get_lib()
    if lib is None:
        return None
    ptrs = np.ascontiguousarray(ptrs, dtype=np.uint8)
    qa = np.frombuffer(q, dtype=np.uint8)
    ta = np.frombuffer(t, dtype=np.uint8)
    cap = len(q) + len(t) + 2
    o1 = np.empty(cap, dtype=np.uint8)
    o2 = np.empty(cap, dtype=np.uint8)
    ln = lib.at_traceback_affine(
        _u8(ptrs), ptrs.shape[1], _u8(qa), len(q), _u8(ta), len(t),
        start_state, i, j, stop, _u8(o1), _u8(o2),
    )
    if ln < 0:
        raise RuntimeError("traceback hit unset pointer (reference UB)")
    return bytes(o1[:ln][::-1]), bytes(o2[:ln][::-1])


def traceback_global_native(q, t, ptrs, start_state, m, n):
    return _walk_native(ptrs, q, t, start_state, m, n, _STOP_GLOBAL)


def traceback_local_native(q, t, ptrs, i_max, j_max):
    if i_max == 0:
        return b"", b""
    return _walk_native(ptrs, q, t, 1, i_max, j_max, _STOP_LOCAL)


def traceback_fit_native(q, t, ptrs, start_state, m, j_max):
    # fit start states: 0=MID 1=LOW (engine) -> C ST_MID=1 / ST_LOW=0
    st = 1 if start_state == 0 else 0
    return _walk_native(ptrs, q, t, st, m, j_max, _STOP_FIT)


def traceback_overlap_native(q, t, ptrs, m, j_max):
    lib = get_lib()
    if lib is None:
        return None
    ptrs = np.ascontiguousarray(ptrs, dtype=np.uint8)
    qa = np.frombuffer(q, dtype=np.uint8)
    ta = np.frombuffer(t, dtype=np.uint8)
    cap = len(q) + len(t) + 2
    o1 = np.empty(cap, dtype=np.uint8)
    o2 = np.empty(cap, dtype=np.uint8)
    ln = lib.at_traceback_overlap(
        _u8(ptrs), ptrs.shape[1], _u8(qa), len(q), _u8(ta), len(t),
        m, j_max, _u8(o1), _u8(o2),
    )
    if ln < 0:
        raise RuntimeError(
            "overlap traceback hit unset pointer (reference UB)"
        )
    return bytes(o1[:ln][::-1]), bytes(o2[:ln][::-1])
