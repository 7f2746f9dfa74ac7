"""Grouped vs unit PELL on real TPU (ROADMAP item 2 validation).

Same protocol as exp/pell_bench.py (two-point chained matvecs) on the
benchmark patterns: 3-D 27-point Laplacian, random banded, ring
pentadiagonal.  The grouped encoding must deliver the probe-projected
win (fewer K slots x ~30% cheaper mechanism, exp/pell_probe3.py) on the
real kernel, not just the stripped variants.
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


def patterns():
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (64, 64))
    lap = (sp.kron(sp.kron(d1, d1), d1) / 27.0).tocsr()

    n = 1 << 20
    rng = np.random.default_rng(0)
    o = np.ones(n)
    ring = sp.diags([o, o, 4 * o, o, o], [-2, -1, 0, 1, 2], (n, n)).tolil()
    ring[0, n - 1] = ring[n - 1, 0] = 1.0
    ring[0, n - 2] = ring[n - 2, 0] = 1.0

    # random banded: 8 entries/row scattered in a 4096-wide band
    rows = np.repeat(np.arange(n), 8)
    cols = rows + rng.integers(-2048, 2048, rows.shape)
    cols = np.clip(cols, 0, n - 1)
    vals = rng.standard_normal(rows.shape) / 8.0
    rb = sp.csr_matrix((vals, (rows, cols)), (n, n))
    rb.sum_duplicates()

    # Multi-window 27-pt: sw forced below the z-plane separation so
    # every tile carries three scattered chunk clusters — the 216^3-tile
    # structure at benchable size (round-5: the grouped4 target case).
    return {"lap27": (lap, {}), "ring": (ring.tocsr(), {}),
            "randband": (rb, {}),
            "lap27mw": ((sp.kron(sp.kron(d1, d1), d1) / 27.0).tocsr(),
                        {"sw": 4096})}


def bench(a, enc, **kw):
    a = sp.csr_matrix(a).astype(np.float32)
    n = a.shape[0]
    t0 = time.perf_counter()
    A = PellMatrix.from_scipy(a, tile=1024, encoding=enc, **kw)
    enc_t = time.perf_counter() - t0
    K = A.k_slots

    rng = np.random.default_rng(0)
    x = np.asarray(rng.standard_normal(n), np.float32)
    y = np.asarray(pell_apply(A, jnp.asarray(x)))
    ref = a @ x
    err = np.max(np.abs(y - ref)) / max(np.max(np.abs(ref)), 1e-30)

    n_x = A.n_x
    g_x = n_x // LANES
    x2 = jnp.asarray(np.pad(x, (0, n_x - n)).reshape(-1, LANES))
    coefs = jnp.zeros(2, jnp.float32)
    vals, lidx, cbase, span = A.vals, A.lidx, A.cbase, A.span_row

    # Planes ride as ARGUMENTS: a closure would capture them as
    # compile-time constants and ship GBs through the remote compiler
    # (2.84 GB at 10M rows — the round-5 compile hangs / HTTP 413s).
    @partial(jax.jit, static_argnames=("reps",))
    def chain(vals, lidx, cbase, span, v, reps):
        def body(i, v):
            y2 = _pell_step(
                vals, lidx, cbase, span, v, jnp.zeros_like(v), coefs,
                A.tile, A.k_slots, A.sw, A.n_win, False, A.enc,
            )
            return jnp.pad(y2, ((0, g_x - y2.shape[0]), (0, 0)))

        return jnp.sum(lax.fori_loop(0, reps, body, v))

    lo, hi_r = 50, 450
    float(chain(vals, lidx, cbase, span, x2, lo))
    float(chain(vals, lidx, cbase, span, x2, hi_r))

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(vals, lidx, cbase, span, x2, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi_r)
    rate = a.nnz * (hi_r - lo) / (t_hi - t_lo) / 1e9
    slot_rate = A.ntiles * K * A.tile * (hi_r - lo) / (t_hi - t_lo) / 1e9
    return dict(enc=A.enc, K=K, rate=rate, slot_rate=slot_rate, err=err,
                enc_t=enc_t)


def main():
    for name, (a, kw) in patterns().items():
        for enc in ("unit", "grouped", "grouped4"):
            try:
                r = bench(a, enc, **kw)
            except Exception as e:
                print(f"{name:9s} {enc:7s} FAILED: {e}", flush=True)
                continue
            print(
                f"{name:9s} {r['enc']:7s} K={r['K']:3d} "
                f"{r['rate']:7.2f} Gnnz/s ({r['slot_rate']:6.1f} Gslot/s) "
                f"err={r['err']:.1e} encode={r['enc_t']:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
