"""One-XLA-call GENERAL-SPARSITY mixed-precision eigensolve on hardware:
fused_restarted_ca_lanczos rides the PELL Pallas kernel (PellMatrix's
matvec inside the fused jit) with f32 basis/SpMV storage and f64
Gram/R/T/eigh reductions — the capability product of VERDICT items 1
(general sparsity at kernel speed) and 5 (mixed precision).

Operator: 262k-row random-banded general-sparsity symmetric matrix (a
pattern the DIA kernel rejects) carrying a separated-top spectrum, so
the oracle (scipy eigsh, f64) is well-conditioned.  Reference seam:
SpMV.m:1-5 (format generality) x restarted_ca_lanczos.m (flagship).

x64 stays ON (mixed precision needs it); the PELL kernel traces under
ops._mosaic.x64_trace_off so Mosaic still sees f32/i32 operands.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ca_lanczos_tpu.ops.pell import PellMatrix
from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos


def build_operator(n, bw=8, k=4, seed=0):
    """Random banded general-sparsity symmetric perturbation (1e-3 scale)
    of a separated-top diagonal spectrum: eigenvalues ~ diag to O(eps^2),
    but the PATTERN is general (random columns inside the band), which
    the DIA kernel cannot encode without one plane per distinct offset."""
    rng = np.random.default_rng(seed)
    d = np.linspace(1.0, 90.0, n)
    d[-10:] = np.linspace(95.0, 100.0, 10)
    rows = np.repeat(np.arange(n), k)
    lo = np.maximum(0, np.arange(n) - bw)
    hi = np.minimum(n, np.arange(n) + bw + 1)
    # vectorized choice-without-replacement via argsort of random keys
    keys = rng.random((n, 2 * bw + 1))
    span = hi - lo
    keys[np.arange(2 * bw + 1)[None, :] >= span[:, None]] = 2.0
    cols = (lo[:, None] + np.argsort(keys, axis=1)[:, :k]).ravel()
    vals = rng.standard_normal(n * k) * 1e-3
    B = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    return ((B + B.T) + sp.diags(d)).tocsr().astype(np.float32)


def main():
    n = 1 << 18
    a = build_operator(n)
    t0 = time.perf_counter()
    A = PellMatrix.from_scipy(a, tile=1024)
    print(f"n={n} nnz={a.nnz} K={A.k_slots} W={A.n_win} "
          f"encode+upload={time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    exact = np.sort(spla.eigsh(a.astype(np.float64), k=10, which="LA",
                               return_eigenvectors=False))[::-1]
    print(f"oracle eigsh ({time.perf_counter()-t0:.1f}s)", flush=True)

    r = jnp.ones(n, jnp.float32)
    for mp in (True, False):
        kw = dict(n_wanted=10, s=8, tol=1e-7, mixed_precision=mp)
        t0 = time.perf_counter()
        res = fused_restarted_ca_lanczos(A, r, 48, **kw)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = fused_restarted_ca_lanczos(A, r, 48, **kw)
        wall = time.perf_counter() - t0
        got = np.sort(res.eigs)[::-1]
        err = np.nanmax(np.abs(got - exact)) / 100.0
        print(
            f"fused pell mp={mp}: converged={res.converged} "
            f"n_restarts={res.n_restarts} eig_rel_err={err:.2e} "
            f"cold={cold:.1f}s warm_wall={wall:.1f}s",
            flush=True,
        )


main()
