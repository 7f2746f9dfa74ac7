"""Corpus metadata tool (reference: get_matrix_info.m:1-30, which writes
matrix_info.txt with size / condest / normest / extreme eigenvalues for
the 105-matrix corpus)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ca_lanczos_tpu.ops.spmv import Operator, normest


def matrix_info(A: Operator, name: str = "", dense_cutoff: int = 2000) -> Dict[str, Any]:
    """Size, nnz, 2-norm estimate and extreme eigenvalues.

    Small operators (n <= dense_cutoff) get exact dense eigenvalues and
    condition number; large ones get the power-iteration norm estimate
    only (matching get_matrix_info.m's normest/eigs usage)."""
    n = A.shape[0]
    info: Dict[str, Any] = {"name": name, "n": n, "nnz": int(A.nnz), "normest": float(normest(A))}
    if n <= dense_cutoff:
        d = np.linalg.eigvalsh(np.asarray(A.to_dense()))
        info["eig_max"] = float(d[-1])
        info["eig_min"] = float(d[0])
        nonzero = np.abs(d)[np.abs(d) > 0]
        info["cond"] = float(np.abs(d).max() / nonzero.min()) if nonzero.size else np.inf
    return info
