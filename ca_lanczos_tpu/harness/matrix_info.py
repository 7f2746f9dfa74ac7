"""Corpus metadata tool (reference: get_matrix_info.m:1-30, which writes
matrix_info.txt with size / condest / normest / extreme eigenvalues for
the 105-matrix corpus)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ca_lanczos_tpu.ops.spmv import Operator, normest


def recommend_solver(
    A: Operator,
    n_wanted: int = 10,
    probe_steps: int = 40,
    cluster_rel_gap: float = 1.0e-3,
    seed: int = 0,
) -> Dict[str, Any]:
    """Driver-selection PRIOR from a cheap spectral probe.

    The round-2 corpus campaign (results/corpus_sweep.jsonl +
    corpus_hard_irl.jsonl) found that explicit thick restart
    (``restarted_ca_lanczos``) fails exactly on clustered-top spectra,
    where single-vector restart cannot re-discover near-degenerate
    partners — while the implicitly-restarted driver with locking
    (``impl_restarted_ca_lanczos``) converges those at the same budget.
    This helper runs a short full-orth Lanczos probe, measures the
    relative gaps among the top ``n_wanted`` Ritz values, and recommends
    the driver accordingly.

    CAVEAT (measured, round 2): the probe is a prior, not a guarantee —
    sub-probe-resolution clusters (e.g. the stiff_1d family's 7e-6 top
    gaps) look well-separated at 40 probe steps and route to the
    explicit driver, which then stalls.  The production entry point is
    ``harness.solve_auto``, which uses this recommendation only to
    order the attempts and escalates to the other driver on
    non-convergence (results/corpus_routed.jsonl).

    Returns {"driver", "clustered", "min_rel_gap", "top_ritz"}.
    """
    import jax.numpy as jnp

    from ca_lanczos_tpu.config import Orth
    from ca_lanczos_tpu.solvers.lanczos import lanczos

    n = A.shape[0]
    rng = np.random.default_rng(seed)
    r = jnp.asarray(rng.random(n), getattr(A, "dtype", jnp.float64))
    steps = min(probe_steps, n - 1)
    boot = lanczos(A, r, steps, Orth.FULL)
    d = np.linalg.eigvalsh(np.asarray(boot.T)[:steps, :steps])
    scale = max(float(np.abs(d).max()), np.finfo(np.float64).tiny)
    top = np.sort(d)[::-1][: min(n_wanted, len(d))]
    gaps = np.abs(np.diff(top)) / scale
    min_gap = float(gaps.min()) if gaps.size else 1.0
    clustered = min_gap < cluster_rel_gap
    return {
        "driver": "impl_restarted_ca_lanczos" if clustered else "restarted_ca_lanczos",
        "clustered": clustered,
        "min_rel_gap": min_gap,
        "top_ritz": top,
    }


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
