"""North-star scale on one chip: the BASELINE target calls for restarted
CA-Lanczos (s=8, Newton basis) on a >=10M-row sparse matrix (the >=2-host
leg is unreachable in this environment — BASELINE.md north-star table).
This runs the one-XLA-call mixed-precision flagship on a 10.5M-row
tridiagonal operator (real off-diagonal structure, so the f32 SpMV
rounding floor applies — unlike a pure diagonal) on the single v5e chip.

Oracle: scipy eigsh (f64) on the same matrix.  Memory: basis 48 x 10.5M
f32 ~ 2 GB, well inside HBM.
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

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos


def main():
    n = 10 * (1 << 20) + (1 << 19)  # 11,010,048 rows
    d = np.linspace(1.0, 90.0, n)
    d[-10:] = np.linspace(95.0, 100.0, 10)
    rng = np.random.default_rng(0)
    off = (rng.standard_normal(n) * 1e-3).astype(np.float64)

    t0 = time.perf_counter()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"flagship_10m_oracle_{n}.npz")
    if os.path.exists(cache):
        exact = np.load(cache)["exact"]
        print("oracle (cached)", flush=True)
    else:
        a = sp.diags([off[:-1], d, off[:-1]], [-1, 0, 1], format="csr")
        exact = np.sort(spla.eigsh(a, k=10, which="LA",
                                   return_eigenvectors=False))[::-1]
        np.savez(cache, exact=exact)
        print(f"oracle eigsh on {n} rows: {time.perf_counter()-t0:.1f}s",
              flush=True)

    # DIA planes: data[k, i] = A[i, i + offsets[k]] (ops/spmv.py:43-49)
    data = np.zeros((3, n), np.float32)
    data[0, 1:] = off[:-1]   # offset -1: A[i, i-1] = off[i-1]
    data[1] = d              # offset 0
    data[2, :-1] = off[:-1]  # offset +1: A[i, i+1] = off[i]
    A = DiaMatrix(data=jnp.asarray(data), offsets=(-1, 0, 1))

    r = jnp.ones(n, jnp.float32)
    # m=32 basis: the 48-vector config's compile-time plan wants 24.5 GB
    # (> 15.75 HBM); 32 vectors fit and restarts make up the depth.
    # cycles_per_call=2: the axon relay kills device calls running many
    # minutes (exp/dbg42.py bisection) — the burst driver bounds each
    # call to two restart cycles with numerics identical to one-call.
    kw = dict(n_wanted=10, s=8, tol=1e-7, mixed_precision=True,
              cycles_per_call=2)
    tb = time.perf_counter()

    def prog(cycle, nconv):
        print(f"  burst: cycle={cycle} nconv={nconv} "
              f"t={time.perf_counter()-tb:.1f}s", flush=True)

    t0 = time.perf_counter()
    res = fused_restarted_ca_lanczos(A, r, 32, on_burst=prog, **kw)
    print(f"cold (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    res = fused_restarted_ca_lanczos(A, r, 32, **kw)
    wall = time.perf_counter() - t0
    got = np.sort(res.eigs)[::-1]
    err = np.nanmax(np.abs(got - exact)) / 100.0
    print(
        f"10M flagship mp: converged={res.converged} n_restarts={res.n_restarts} "
        f"eig_rel_err={err:.2e} warm_wall={wall:.1f}s",
        flush=True,
    )


main()
