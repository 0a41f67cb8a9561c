"""ctypes loader for the native DP engine (lazy-built with g++).

The shared object is built once per machine into this package directory;
when no compiler is available the caller falls back to the numpy mirror
(ops/align.py decides).  Semantics are cell-exact vs the other backends for
gap_open > gap_ext (always true in this pipeline: tiers 2-5 vs ext 1);
tests/test_native.py verifies move-level parity.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "sgdp.cpp")
_SO = os.path.join(_DIR, "_sgdp.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        logger.debug("native DP build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_SO) or (
            os.path.isfile(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.debug("native DP load failed: %s", e)
            return None
        lib.sg_align_batch_native.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sg_align_batch_native.restype = None
        lib.sg_block_stats_native.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.sg_block_stats_native.restype = None
        lib.sg_identity_native.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.sg_identity_native.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def align_batch_native(
    pairs: List[Tuple[np.ndarray, np.ndarray]],
    gap_opens: List[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1,
    band: int = 0,
) -> List[np.ndarray]:
    lib = get_lib()
    assert lib is not None, "native DP engine unavailable"
    B = len(pairs)
    n_stride = max(a.size for a, _ in pairs)
    m_stride = max(b.size for _, b in pairs)
    s1b = np.zeros((B, n_stride), dtype=np.uint8)
    s2b = np.zeros((B, m_stride), dtype=np.uint8)
    len1 = np.empty(B, dtype=np.int32)
    len2 = np.empty(B, dtype=np.int32)
    opens = np.asarray(gap_opens, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        s1b[i, : a.size] = a
        s2b[i, : b.size] = b
        len1[i] = a.size
        len2[i] = b.size
    moves_out = np.empty((B, n_stride + m_stride), dtype=np.uint8)
    moves_len = np.empty(B, dtype=np.int32)
    scores = np.empty(B, dtype=np.int32)

    def p(arr, typ):
        return arr.ctypes.data_as(ctypes.POINTER(typ))

    lib.sg_align_batch_native(
        p(s1b, ctypes.c_uint8), p(s2b, ctypes.c_uint8),
        p(len1, ctypes.c_int32), p(len2, ctypes.c_int32),
        p(opens, ctypes.c_int32),
        B, n_stride, m_stride, match, mismatch, gap_ext, band,
        p(moves_out, ctypes.c_uint8), p(moves_len, ctypes.c_int32),
        p(scores, ctypes.c_int32),
    )
    return [moves_out[i, : moves_len[i]].copy() for i in range(B)]


def _pack_pairs(pairs):
    B = len(pairs)
    n_stride = max(a.size for a, _ in pairs)
    m_stride = max(b.size for _, b in pairs)
    s1b = np.zeros((B, n_stride), dtype=np.uint8)
    s2b = np.zeros((B, m_stride), dtype=np.uint8)
    len1 = np.empty(B, dtype=np.int32)
    len2 = np.empty(B, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        s1b[i, : a.size] = a
        s2b[i, : b.size] = b
        len1[i] = a.size
        len2[i] = b.size
    return s1b, s2b, len1, len2, n_stride, m_stride


def block_stats_native(
    pairs: List[Tuple[np.ndarray, np.ndarray]],
    gap_opens: List[int],
    ks: List[int], match_ids: List[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1, band: int = 0,
):
    """(aligned_ratio, target_ratio) per pair, computed entirely in C."""
    lib = get_lib()
    assert lib is not None
    s1b, s2b, len1, len2, n_stride, m_stride = _pack_pairs(pairs)
    B = len(pairs)
    ratios = np.empty(2 * B, dtype=np.float64)

    def p(arr, typ):
        return arr.ctypes.data_as(ctypes.POINTER(typ))

    lib.sg_block_stats_native(
        p(s1b, ctypes.c_uint8), p(s2b, ctypes.c_uint8),
        p(len1, ctypes.c_int32), p(len2, ctypes.c_int32),
        p(np.asarray(gap_opens, dtype=np.int32), ctypes.c_int32),
        p(np.asarray(ks, dtype=np.int32), ctypes.c_int32),
        p(np.asarray(match_ids, dtype=np.int32), ctypes.c_int32),
        B, n_stride, m_stride, match, mismatch, gap_ext, band,
        p(ratios, ctypes.c_double),
    )
    return [(ratios[2 * i], ratios[2 * i + 1]) for i in range(B)]


def identity_native(
    pairs: List[Tuple[np.ndarray, np.ndarray]],
    gap_opens: List[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1, band: int = 0,
):
    """Column identity per pair (matches / alignment columns), in C."""
    lib = get_lib()
    assert lib is not None
    s1b, s2b, len1, len2, n_stride, m_stride = _pack_pairs(pairs)
    B = len(pairs)
    out = np.empty(B, dtype=np.float64)

    def p(arr, typ):
        return arr.ctypes.data_as(ctypes.POINTER(typ))

    lib.sg_identity_native(
        p(s1b, ctypes.c_uint8), p(s2b, ctypes.c_uint8),
        p(len1, ctypes.c_int32), p(len2, ctypes.c_int32),
        p(np.asarray(gap_opens, dtype=np.int32), ctypes.c_int32),
        B, n_stride, m_stride, match, mismatch, gap_ext, band,
        p(out, ctypes.c_double),
    )
    return out.tolist()
