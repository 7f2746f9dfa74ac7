"""Probe: f64 ELL panel SpMM on device via row gathers (the missing
piece for a DEVICE general-sparsity polish; round-5).

The polish needs A @ X with f64-grade accuracy on (n, k~13) panels.
The PELL kernel is f32-only; the old 'XLA gather ~0.1 Gnnz/s' figure
was for single-VECTOR gathers.  For PANELS the gather moves k
contiguous elements per index — this measures whether chunked
take-based f64 SpMM reaches usable rates.

Usage: python -u exp/ell64_panel_probe.py [n] [k]
"""
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
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax import lax

T00 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-T00:7.1f}s] {m}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    nnz_row = 8
    rng = np.random.default_rng(0)
    cols = np.clip(
        np.arange(n)[:, None] + rng.integers(-8, 9, (n, nnz_row)), 0, n - 1
    ).astype(np.int32)
    vals = rng.standard_normal((n, nnz_row))
    X = rng.standard_normal((n, k))
    v_d = jnp.asarray(vals)
    c_d = jnp.asarray(cols)
    x_d = jnp.asarray(X)
    log(f"n={n} k={k} nnz={n*nnz_row/1e6:.1f}M (f64)")

    CH = 1 << 18

    @partial(jax.jit, static_argnames=("reps",))
    def apply_chunked(v, c, X, reps):
        nch = v.shape[0] // CH

        def one(Xc):
            def body(i, Y):
                vb = lax.dynamic_slice_in_dim(v, i * CH, CH, 0)
                cb = lax.dynamic_slice_in_dim(c, i * CH, CH, 0)
                g = jnp.take(Xc, cb, axis=0)  # (CH, nnz_row, k)
                yb = jnp.einsum("re,rek->rk", vb, g)
                return lax.dynamic_update_slice_in_dim(Y, yb, i * CH, 0)

            return lax.fori_loop(0, nch, body, jnp.zeros_like(Xc))

        def rep(i, Xc):
            Y = one(Xc)
            return Y / jnp.linalg.norm(Y)

        return jnp.sum(lax.fori_loop(0, reps, rep, X))

    lo, hi = 2, 12
    t0 = time.perf_counter()
    float(apply_chunked(v_d, c_d, x_d, lo))
    float(apply_chunked(v_d, c_d, x_d, hi))
    log(f"compiled in {time.perf_counter()-t0:.1f}s")

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(apply_chunked(v_d, c_d, x_d, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi)
    per_apply = (t_hi - t_lo) / (hi - lo)
    rate = n * nnz_row / per_apply / 1e9
    log(f"f64 panel apply (k={k}): {per_apply*1e3:.1f} ms "
        f"= {rate:.2f} Gnnz/s ({rate*k:.1f} G gathered-elt/s)")


main()
