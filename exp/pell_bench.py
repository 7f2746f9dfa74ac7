"""PELL kernel on real TPU: correctness + throughput on a 3-D 27-point
Laplacian (general sparsity far beyond the banded DIA kernel's reach)."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import lax

from ca_lanczos_tpu.ops.pell import LANES, PellMatrix, _pell_step, pell_apply


def laplacian_3d_27pt(m):
    """27-point stencil on an m^3 grid (scaled to keep powers bounded)."""
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (m, m))
    a = sp.kron(sp.kron(d1, d1), d1).tocsr()  # all-ones 27-pt
    a = a * (1.0 / 27.0)
    return a


def main():
    m = 64
    a = laplacian_3d_27pt(m).astype(np.float32)
    n = a.shape[0]
    print(f"n={n}, nnz={a.nnz}, nnz/row={a.nnz/n:.1f}", flush=True)

    t0 = time.perf_counter()
    A = PellMatrix.from_scipy(a, tile=1024, cmax=8)
    enc_t = time.perf_counter() - t0
    K = A.k_slots
    pad_eff = a.nnz / (A.ntiles * K * A.tile)
    print(
        f"encode {enc_t:.1f}s  K={K} sw={A.sw} slot-packing={pad_eff:.2f}",
        flush=True,
    )

    # Correctness on hardware
    rng = np.random.default_rng(0)
    x = np.asarray(rng.standard_normal(n), np.float32)
    y = np.asarray(pell_apply(A, jnp.asarray(x)))
    err = np.max(np.abs(y - a @ x)) / np.max(np.abs(a @ x))
    print(f"hardware matvec rel err: {err:.2e}", flush=True)

    # Throughput: chained matvecs in one jit (two-point protocol)
    n_x = A.n_x
    g_x = n_x // LANES
    x2 = jnp.asarray(np.pad(x, (0, n_x - n)).reshape(-1, LANES))
    coefs = jnp.zeros(2, jnp.float32)
    vals, lidx, cbase, span = A.vals, A.lidx, A.cbase, A.span_row

    @partial(jax.jit, static_argnames=("reps",))
    def chain(v, reps):
        def body(i, v):
            y2 = _pell_step(
                vals, lidx, cbase, span, v, jnp.zeros_like(v), coefs,
                A.tile, A.k_slots, A.sw, A.n_win, False,
            )
            return jnp.pad(y2, ((0, g_x - y2.shape[0]), (0, 0)))

        return jnp.sum(lax.fori_loop(0, reps, body, v))

    lo, hi_r = 50, 450
    float(chain(x2, lo)); float(chain(x2, hi_r))

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(x2, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi_r)
    rate = a.nnz * (hi_r - lo) / (t_hi - t_lo) / 1e9
    slot_rate = A.ntiles * K * A.tile * (hi_r - lo) / (t_hi - t_lo) / 1e9
    print(f"PELL SpMV: {rate:.2f} Gnnz/s/chip  ({slot_rate:.1f} Gslot/s)", flush=True)


if __name__ == "__main__":
    main()
