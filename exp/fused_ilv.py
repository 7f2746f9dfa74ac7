"""Interleaved-layout fused s-step DIA kernel (ROADMAP item 1 candidate).

The production fused kernel is VPU-bound: ~9 shifted 1-D reads per
element per step, 8 of them misaligned (lane-roll + select each).  This
variant stores vectors J-INTERLEAVED: x_il[r*nq + q] = x[J*q + r]
(nq = n/J).  A stencil offset o for output row r reads source row
(r+o) mod J at q-offset carry = (r+o)//J; with J=8 and |o|<=4, 72% of
the (r, o) pairs have carry 0 — a fully ALIGNED contiguous read — and
the rest are misaligned by ONE element.  Data planes are pre-permuted
on the host into a tile-major layout, so the kernel's inner loop is
almost entirely aligned mul/add streams.

The permutation is invisible to the solver: Gram products, axpys, and
norms are permutation-invariant, so q0 is encoded once and eigenvectors
decoded once; chained powers (bench, s-step drivers) stay interleaved
throughout.  V rows and the final vector are written by per-row DMAs
(the interleaved tile's rows are scattered in the flat output), drained
before the tile ends.

Parity: bit-comparable to the XLA path up to FMA-contraction order
(same 1-2 ulp class as the production kernel's tree-sum).
"""
import os
import sys
import time
from functools import partial
from typing import Optional, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ca_lanczos_tpu.ops._mosaic import x64_trace_off
from ca_lanczos_tpu.ops.spmv import DiaMatrix

from ca_lanczos_tpu.ops.pallas_ilv import (  # kernel productized
    J, WQ, KPAD, dia_powers_ilv, ilv_data_tiled, ilv_decode, ilv_encode,
)

def make_op(n, nd=9, seed=0):
    rng = np.random.default_rng(seed)
    half = nd // 2
    offsets = tuple(range(-half, half + 1))
    data = (rng.standard_normal((nd, n)) / nd).astype(np.float32)
    return DiaMatrix(data=jnp.asarray(data), offsets=offsets)


def check_interpret():
    n, s, Tq = 8 * 2048 * 2, 3, 1024  # nq=4096, 4 tiles
    A = make_op(n)
    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal(n), np.float32)
    coefs = jnp.asarray(rng.standard_normal((s, 2)) * 0.1, jnp.float32)

    from ca_lanczos_tpu.ops.matrix_powers import _newton_scan

    V_ref = np.asarray(
        _newton_scan(A, jnp.asarray(x), s,
                     jnp.asarray(np.asarray(coefs)[:, 0]),
                     jnp.asarray(np.asarray(coefs)[:, 1]))
    )  # (n, s+1)

    dfl = jnp.asarray(ilv_data_tiled(A, Tq))
    x_il = jnp.asarray(ilv_encode(x))
    Vf, lf = dia_powers_ilv(dfl, x_il, coefs, A.offsets, s, Tq, n,
                            interpret=True)
    Vf = np.asarray(Vf).reshape(s, n)
    for j in range(s):
        vj = ilv_decode(Vf[j])
        np.testing.assert_allclose(vj, V_ref[:, j + 1], rtol=2e-5, atol=2e-6,
                                   err_msg=f"step {j}")
    np.testing.assert_allclose(ilv_decode(np.asarray(lf)), V_ref[:, s],
                               rtol=2e-5, atol=2e-6)
    print("ilv interpret parity ok", flush=True)


def bench_hw():
    from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused, dia_flat_padded

    n, s = 1 << 22, 8
    print("building operator...", flush=True)
    A = make_op(n)
    nnz = 9 * n
    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal(n), np.float32)
    coefs = jnp.zeros((s, 2), jnp.float32)

    W = ((s * 4 + 1023) // 1024) * 1024
    dflat = dia_flat_padded(A, W)
    x0 = jnp.asarray(x)
    print("operator on device", flush=True)

    @jax.jit
    def chain0(v, reps):
        def body(i, v):
            _, last = _dia_powers_fused(dflat, v, coefs, A.offsets, s,
                                        with_coefs=False)
            return last
        return jnp.sum(lax.fori_loop(0, reps, body, v))

    results = {}
    lo, hi = 5, 45

    def run_timed(chain, v):
        t0 = time.perf_counter()
        float(chain(v, jnp.int32(lo)))
        print(f"  compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)
        float(chain(v, jnp.int32(hi)))
        def timed(reps, trials=3):
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                float(chain(v, jnp.int32(reps)))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        t_lo, t_hi = timed(lo), timed(hi)
        return nnz * s * (hi - lo) / (t_hi - t_lo) / 1e9

    print("compiling baseline chain...", flush=True)
    results["baseline"] = run_timed(chain0, x0)
    print(f"baseline: {results['baseline']:.1f} Gnnz/s", flush=True)

    for Tq in (16384, 8192):
        try:
            print(f"encoding ilv Tq={Tq}...", flush=True)
            dfl = jnp.asarray(ilv_data_tiled(A, Tq))
            x_il = jnp.asarray(ilv_encode(x))

            @jax.jit
            def chain1(v, reps, dfl=dfl, Tq=Tq):
                def body(i, v):
                    _, last = dia_powers_ilv(dfl, v, coefs, A.offsets, s,
                                             Tq, n, with_coefs=False)
                    return last
                return jnp.sum(lax.fori_loop(0, reps, body, v))

            print(f"compiling ilv Tq={Tq} chain...", flush=True)
            r = run_timed(chain1, x_il)
            print(f"ilv Tq={Tq}: {r:.1f} Gnnz/s", flush=True)
            # hardware correctness spot check
            Vf, lf = dia_powers_ilv(dfl, x_il, jnp.asarray(
                np.zeros((s, 2)), jnp.float32), A.offsets, s, Tq, n,
                with_coefs=False)
            from ca_lanczos_tpu.ops.matrix_powers import matrix_powers_monomial
            V_ref = np.asarray(matrix_powers_monomial(A, x0, 2))
            v1 = ilv_decode(np.asarray(Vf).reshape(s, n)[0])
            err = np.max(np.abs(v1 - V_ref[:, 1])) / max(
                np.max(np.abs(V_ref[:, 1])), 1e-30)
            print(f"  hw step-1 rel err vs XLA: {err:.2e}", flush=True)
        except Exception as e:
            print(f"ilv Tq={Tq} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    if "--hw" in sys.argv:
        bench_hw()
    else:
        jax.config.update("jax_platforms", "cpu")
        check_interpret()
