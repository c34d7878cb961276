"""Native (C++) data-plane kernels, loaded via ctypes with graceful fallback.

Build on demand with :func:`ensure_built` (g++ -O3 -shared); the NumPy oracle
in :mod:`s2anet_tpu.ops.polyiou_ref` is the semantic reference — golden tests
assert the two agree to 1e-12. Disable with ``S2ANET_NO_NATIVE=1``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "polyiou.cpp"
_SO = _HERE / "_polyiou.so"
_lock = threading.Lock()
_lib = None
_tried = False


def ensure_built(force: bool = False) -> Optional[Path]:
    """Compile the shared library if needed; returns its path or None."""
    if os.environ.get("S2ANET_NO_NATIVE"):
        return None
    if _SO.exists() and not force:
        if _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = ensure_built()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.iou_poly.restype = ctypes.c_double
        lib.iou_poly.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int]
        lib.pairwise_poly_iou.restype = None
        lib.pairwise_poly_iou.argtypes = [dp, ctypes.c_int64, dp,
                                          ctypes.c_int64, dp]
        lib.rbox_iou_matrix.restype = None
        lib.rbox_iou_matrix.argtypes = [dp, ctypes.c_int64, dp,
                                        ctypes.c_int64, dp]
        lib.poly_nms.restype = ctypes.c_int64
        lib.poly_nms.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_double, ip]
        _lib = lib
        return _lib


def _as_c(arr):
    a = np.ascontiguousarray(arr, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def iou_poly_native(p1, p2) -> Optional[float]:
    lib = get_lib()
    if lib is None:
        return None
    a1, c1 = _as_c(np.asarray(p1).reshape(-1))
    a2, c2 = _as_c(np.asarray(p2).reshape(-1))
    return float(lib.iou_poly(c1, len(a1) // 2, c2, len(a2) // 2))


def rbox_iou_matrix_native(b1, b2) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    b1 = np.ascontiguousarray(b1, np.float64).reshape(-1, 5)
    b2 = np.ascontiguousarray(b2, np.float64).reshape(-1, 5)
    out = np.zeros((len(b1), len(b2)), np.float64)
    _, c1 = _as_c(b1)
    _, c2 = _as_c(b2)
    _, co = _as_c(out)
    lib.rbox_iou_matrix(c1, len(b1), c2, len(b2),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def poly_nms_native(polys, scores, thresh: float):
    lib = get_lib()
    if lib is None:
        return None
    polys = np.ascontiguousarray(polys, np.float64).reshape(-1, 8)
    scores = np.ascontiguousarray(scores, np.float64)
    keep = np.zeros(len(polys), np.int64)
    _, cp = _as_c(polys)
    _, cs = _as_c(scores)
    n = lib.poly_nms(cp, cs, len(polys), float(thresh),
                     keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:n].tolist()
