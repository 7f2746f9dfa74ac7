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

J = 8
WQ = 1024  # per-row q-halo (alignment unit; pollution depth is only ~s)
KPAD = 1024  # buffer end rims for cross-row carry reads


def ilv_encode(x: np.ndarray) -> np.ndarray:
    """x (n,) -> interleaved (n,): out[r*nq + q] = x[J*q + r]."""
    n = x.shape[0]
    return np.ascontiguousarray(np.asarray(x).reshape(n // J, J).T).reshape(-1)


def ilv_decode(y: np.ndarray) -> np.ndarray:
    n = y.shape[0]
    return np.ascontiguousarray(np.asarray(y).reshape(J, n // J).T).reshape(-1)


def ilv_data_tiled(A: DiaMatrix, Tq: int) -> np.ndarray:
    """Tile-major interleaved data planes: flat
    (ntiles * nd * J * Lq,) with dataI[i,d,r,q'] = data[d, J*(i*Tq - WQ
    + q') + r] (zero outside [0, nq))."""
    data = np.asarray(A.data)
    nd, n = data.shape
    nq = n // J
    Lq = Tq + 2 * WQ
    ntiles = nq // Tq
    # (nd, nq, J) -> (nd, J, nq) -> pad q
    dI = np.ascontiguousarray(data.reshape(nd, nq, J).transpose(0, 2, 1))
    dIp = np.pad(dI, ((0, 0), (0, 0), (WQ, WQ)))
    out = np.empty((ntiles, nd, J, Lq), data.dtype)
    for i in range(ntiles):
        out[i] = dIp[:, :, i * Tq : i * Tq + Lq]
    return out.reshape(-1)


@partial(
    jax.jit,
    static_argnames=("offsets", "s", "Tq", "n", "interpret", "with_coefs"),
)
def dia_powers_ilv(
    dflat_il: jax.Array,  # from ilv_data_tiled
    x_il: jax.Array,  # (n,) interleaved
    coefs: jax.Array,  # (s, 2)
    offsets: Tuple[int, ...],
    s: int,
    Tq: int,
    n: int,
    interpret: bool = False,
    with_coefs: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (V_il (s, n), last_il (n,)) in the interleaved layout."""
    nd = len(offsets)
    nq = n // J
    assert n % (J * Tq) == 0 and nq % 1024 == 0 and Tq % 1024 == 0
    Lq = Tq + 2 * WQ
    LB = KPAD + J * Lq + KPAD  # ping-pong buffer length
    ntiles = nq // Tq
    assert ntiles >= 2, "ilv kernel needs >= 2 tiles"
    DSZ = nd * J * Lq

    # static (row, offset) -> (src_row, carry) table
    plan = []
    for r in range(J):
        row_terms = []
        for d, off in enumerate(offsets):
            src = r + off
            carry = src // J  # floor
            row_terms.append((d, src - carry * J, carry))
        plan.append(row_terms)

    def kernel(coef_ref, dflat_ref, x_ref, v_ref, last_ref,
               dscr0, dscr1, a0, b0, a1, b1, dsem, xsem, vsem):
        i = pl.program_id(0)
        num = pl.num_programs(0)
        slot = i % 2

        def xfer(dscr, abuf, sl, tile_idx, go):
            cp = pltpu.make_async_copy(
                dflat_ref.at[pl.ds(tile_idx * DSZ, DSZ)], dscr, dsem.at[sl]
            )
            cp.start() if go else cp.wait()
            for r in range(J):
                dst0 = KPAD + r * Lq

                def head(r=r, dst0=dst0):
                    cp = pltpu.make_async_copy(
                        x_ref.at[pl.ds(r * nq, Tq + WQ)],
                        abuf.at[pl.ds(dst0 + WQ, Tq + WQ)],
                        xsem.at[sl, r],
                    )
                    if go:
                        abuf[pl.ds(dst0, WQ)] = jnp.zeros((WQ,), abuf.dtype)
                        cp.start()
                    else:
                        cp.wait()

                def tail(r=r, dst0=dst0):
                    cp = pltpu.make_async_copy(
                        x_ref.at[pl.ds(r * nq + nq - (Tq + WQ), Tq + WQ)],
                        abuf.at[pl.ds(dst0, Tq + WQ)],
                        xsem.at[sl, r],
                    )
                    if go:
                        abuf[pl.ds(dst0 + WQ + Tq, WQ)] = jnp.zeros(
                            (WQ,), abuf.dtype
                        )
                        cp.start()
                    else:
                        cp.wait()

                def interior(r=r, dst0=dst0):
                    off = (r * (nq // 1024) + tile_idx * (Tq // 1024)
                           - (WQ // 1024)) * 1024
                    cp = pltpu.make_async_copy(
                        x_ref.at[pl.ds(off, Lq)],
                        abuf.at[pl.ds(dst0, Lq)],
                        xsem.at[sl, r],
                    )
                    cp.start() if go else cp.wait()

                pl.when(tile_idx == 0)(head)
                pl.when(tile_idx == num - 1)(tail)
                pl.when((tile_idx > 0) & (tile_idx < num - 1))(interior)

        @pl.when(i == 0)
        def _():
            xfer(dscr0, a0, 0, i * 0, True)

        @pl.when((i + 1 < num) & ((i + 1) % 2 == 0))
        def _():
            xfer(dscr0, a0, 0, i + 1, True)

        @pl.when((i + 1 < num) & ((i + 1) % 2 == 1))
        def _():
            xfer(dscr1, a1, 1, i + 1, True)

        def compute(dscr, abuf, bbuf, sl):
            # rims must be zero for the carry reads at r=0 / r=J-1
            abuf[pl.ds(0, KPAD)] = jnp.zeros((KPAD,), abuf.dtype)
            abuf[pl.ds(KPAD + J * Lq, KPAD)] = jnp.zeros((KPAD,), abuf.dtype)
            bbuf[pl.ds(0, KPAD)] = jnp.zeros((KPAD,), bbuf.dtype)
            bbuf[pl.ds(KPAD + J * Lq, KPAD)] = jnp.zeros((KPAD,), bbuf.dtype)
            bufs = (abuf, bbuf)
            pend = []  # python bookkeeping of un-waited V DMAs: (buf_idx, r)

            for j in range(s):
                cur, nxt = bufs[j % 2], bufs[(j + 1) % 2]
                # before overwriting nxt rows, drain its pending V DMAs
                for (bi, r) in [p for p in pend if p[0] == (j + 1) % 2]:
                    pltpu.make_async_copy(
                        nxt.at[pl.ds(KPAD + r * Lq + WQ, Tq)],
                        v_ref.at[pl.ds(0, Tq)],  # shape-only for wait
                        vsem.at[sl, bi, r],
                    ).wait()
                pend = [p for p in pend if p[0] != (j + 1) % 2]
                for r in range(J):
                    base = KPAD + r * Lq
                    terms = []
                    for d, srow, carry in plan[r]:
                        rd = cur[pl.ds(KPAD + srow * Lq + carry, Lq)]
                        terms.append(
                            dscr[pl.ds((d * J + r) * Lq, Lq)] * rd
                        )
                    while len(terms) > 1:
                        terms = [
                            terms[t] + terms[t + 1]
                            if t + 1 < len(terms) else terms[t]
                            for t in range(0, len(terms), 2)
                        ]
                    w = terms[0]
                    if with_coefs:
                        w = w - coef_ref[j, 0] * cur[pl.ds(base, Lq)]
                        if j > 0:
                            w = w - coef_ref[j, 1] * nxt[pl.ds(base, Lq)]
                    nxt[pl.ds(base, Lq)] = w
                # stream step j's owned centers out
                for r in range(J):
                    cp = pltpu.make_async_copy(
                        nxt.at[pl.ds(KPAD + r * Lq + WQ, Tq)],
                        v_ref.at[pl.ds(j * n + r * nq + i * Tq, Tq)],
                        vsem.at[sl, (j + 1) % 2, r],
                    )
                    cp.start()
                    pend.append(((j + 1) % 2, r))

            # final vector + full drain before the tile ends
            fin = bufs[s % 2]
            for r in range(J):
                pltpu.make_async_copy(
                    fin.at[pl.ds(KPAD + r * Lq + WQ, Tq)],
                    last_ref.at[pl.ds(r * nq + i * Tq, Tq)],
                    vsem.at[sl, s % 2, r],
                ).start()
                pend.append((s % 2, r))
            for (bi, r) in pend:
                pltpu.make_async_copy(
                    fin.at[pl.ds(KPAD + r * Lq + WQ, Tq)],
                    last_ref.at[pl.ds(0, Tq)],
                    vsem.at[sl, bi, r],
                ).wait()

        @pl.when(slot == 0)
        def _():
            xfer(dscr0, a0, 0, i, False)
            compute(dscr0, a0, b0, 0)

        @pl.when(slot == 1)
        def _():
            xfer(dscr1, a1, 1, i, False)
            compute(dscr1, a1, b1, 1)

    vma = getattr(jax.typeof(x_il), "vma", frozenset())
    with x64_trace_off(x_il.dtype):
        return pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s * n,), x_il.dtype, vma=vma),
                jax.ShapeDtypeStruct((n,), x_il.dtype, vma=vma),
            ],
            scratch_shapes=[
                pltpu.VMEM((DSZ,), x_il.dtype),
                pltpu.VMEM((DSZ,), x_il.dtype),
                pltpu.VMEM((LB,), x_il.dtype),
                pltpu.VMEM((LB,), x_il.dtype),
                pltpu.VMEM((LB,), x_il.dtype),
                pltpu.VMEM((LB,), x_il.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, J)),
                pltpu.SemaphoreType.DMA((2, 2, J)),
            ],
            interpret=interpret,
        )(coefs, dflat_il, x_il)


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
