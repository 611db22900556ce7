"""ctypes bindings for the native C++ core (csrc/nbldpc_core.cpp).

Auto-builds ``libnbldpc.so`` with the repo Makefile on first use (cached).
All entry points degrade gracefully: ``available()`` is False when no
compiler is present, and callers fall back to the NumPy golden model.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .models.code import NBCode

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libnbldpc.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_dbl_p = ctypes.POINTER(ctypes.c_double)
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.nbldpc_decode_batch.restype = ctypes.c_int
    lib.nbldpc_decode_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_int_p, c_int_p, c_int_p,
        ctypes.c_int, c_dbl_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, c_int_p, c_int_p, c_u8_p,
    ]
    lib.nbldpc_elementary_step.restype = ctypes.c_int
    lib.nbldpc_elementary_step.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_dbl_p, c_int_p, c_dbl_p, c_int_p, c_dbl_p, c_int_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def decode_batch(
    code: NBCode, intrinsic: np.ndarray, max_iters: int, nm: int,
    offset: float, nb_oper: int,
):
    """intrinsic: [F, N, q] float64 -> (decide [F,N], iters [F], conv [F])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    intrinsic = np.ascontiguousarray(intrinsic, dtype=np.float64)
    f = intrinsic.shape[0]
    row_deg = np.ascontiguousarray(code.row_deg, dtype=np.int32)
    row_cols = np.ascontiguousarray(code.row_cols, dtype=np.int32)
    row_coefs = np.ascontiguousarray(code.row_coefs, dtype=np.int32)
    decide = np.zeros((f, code.n), dtype=np.int32)
    iters = np.zeros(f, dtype=np.int32)
    conv = np.zeros(f, dtype=np.uint8)
    rc = lib.nbldpc_decode_batch(
        code.q, code.n, code.m_rows, code.dc_max,
        _ip(row_deg), _ip(row_cols), _ip(row_coefs),
        f, intrinsic.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_iters, nm, offset, nb_oper,
        _ip(decide), _ip(iters),
        conv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"nbldpc_decode_batch failed rc={rc}")
    return decide, iters, conv.astype(bool)


def elementary_step(q: int, v1, g1, v2, g2, nm: int, nb_oper: int):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    v1 = np.ascontiguousarray(v1, np.float64)
    v2 = np.ascontiguousarray(v2, np.float64)
    g1 = np.ascontiguousarray(g1, np.int32)
    g2 = np.ascontiguousarray(g2, np.int32)
    ov = np.zeros(nm, np.float64)
    og = np.zeros(nm, np.int32)
    rc = lib.nbldpc_elementary_step(
        q, nm, nb_oper,
        v1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), _ip(g1),
        v2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), _ip(g2),
        ov.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), _ip(og),
    )
    if rc != 0:
        raise RuntimeError("elementary_step failed")
    return ov, og
