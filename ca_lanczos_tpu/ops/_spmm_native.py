"""ctypes binding to the native OpenMP CSR SpMM (native/spmm.cpp).

``csr_matmul(a, X)`` multiplies a scipy CSR by a dense (n, k) f64 panel
row-parallel — the host-polish apply for general sparsity, where
scipy's single-threaded csr_matvecs costs ~8 s per apply at 84M nnz.
Falls back to ``a @ X`` when the library cannot be built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    from ca_lanczos_tpu.utils._native_build import build_native

    so = build_native(os.path.join(_NATIVE_DIR, "spmm.cpp"),
                      ["-O3", "-fopenmp"])
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.csr_spmm_f64.restype = None
    lib.csr_spmm_f64.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


class CsrMatmul:
    """Reusable A @ X for one scipy CSR matrix (caches the int64/int32
    index views the C ABI needs).  k must be <= 64."""

    def __init__(self, a):
        import scipy.sparse as sp

        csr = sp.csr_matrix(a)
        csr.sort_indices()
        self._a = csr
        self._indptr = np.ascontiguousarray(csr.indptr, np.int64)
        self._indices = np.ascontiguousarray(csr.indices, np.int32)
        self._data = np.ascontiguousarray(csr.data, np.float64)
        self._n = csr.shape[0]
        self._lib = _load()

    def __call__(self, X: np.ndarray) -> np.ndarray:
        X = np.ascontiguousarray(X, np.float64)
        one = X.ndim == 1
        if one:
            X = X[:, None]
        k = X.shape[1]
        if self._lib is None or k > 64:
            Y = self._a @ X
        else:
            Y = np.empty((self._n, k), np.float64)
            self._lib.csr_spmm_f64(self._n, self._indptr, self._indices,
                                   self._data, X, k, Y)
        return Y[:, 0] if one else Y
