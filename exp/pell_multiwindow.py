"""Multi-window PELL on real TPU: hardware parity + throughput for
sparsity patterns a single x-span cannot cover.

Two cases:
* ring-periodic pentadiagonal (1M rows): the reference's periodic FD
  Hamiltonian pattern (runLanczos.m:15-18) — wrap entries put
  |col-row| ~ n-2 in the first/last row tiles, so those tiles need a
  second x-span window at the far end of the vector.
* arrow + band (1M rows): every tile couples to the leading block
  column, the classic "RCM cannot fix this" pattern.
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
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import lax

from ca_lanczos_tpu.ops.pell import LANES, PellMatrix, _pell_step, pell_apply


def ring_pentadiagonal(n):
    diags = [
        (np.full(n - 2, -0.1), -2),
        (np.full(n - 1, -0.25), -1),
        (np.full(n, 1.0), 0),
        (np.full(n - 1, -0.25), 1),
        (np.full(n - 2, -0.1), 2),
    ]
    a = sp.diags([d for d, _ in diags], [o for _, o in diags], format="lil")
    for k in (1, 2):  # periodic wrap of both off-diagonal bands
        for j in range(k):
            a[j, n - k + j] = -0.25 if k == 1 else -0.1
            a[n - k + j, j] = -0.25 if k == 1 else -0.1
    return sp.csr_matrix(a)


def arrow_band(n, seed=0):
    rng = np.random.default_rng(seed)
    a = sp.diags(
        [np.full(n - 1, -0.2), np.full(n, 1.0), np.full(n - 1, -0.2)], [-1, 0, 1]
    ).tolil()
    rows = np.arange(0, n, 37)
    for i in rows:
        a[i, int(rng.integers(0, 256))] = 0.3
    return sp.csr_matrix(a)


def bench_case(name, a, sw):
    n = a.shape[0]
    t0 = time.perf_counter()
    A = PellMatrix.from_scipy(a, tile=1024, sw=sw)
    enc_t = time.perf_counter() - t0
    print(
        f"[{name}] n={n} nnz={a.nnz} K={A.k_slots} sw={A.sw} W={A.n_win}"
        f" encode={enc_t:.1f}s",
        flush=True,
    )

    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal(n), np.float32)
    y = np.asarray(pell_apply(A, jnp.asarray(x)))
    ref = a @ x
    err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    print(f"[{name}] hardware matvec rel err: {err:.2e}", flush=True)

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

    lo, hi = 20, 120
    float(chain(x2, lo)); float(chain(x2, hi))

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(x2, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi)
    rate = a.nnz * (hi - lo) / (t_hi - t_lo) / 1e9
    print(f"[{name}] PELL SpMV: {rate:.2f} Gnnz/s/chip", flush=True)
    return err, rate


def main():
    n = 1 << 20
    bench_case("ring_penta_1M", ring_pentadiagonal(n).astype(np.float32), sw=8192)
    bench_case("arrow_band_1M", arrow_band(n).astype(np.float32), sw=4096)


if __name__ == "__main__":
    main()
