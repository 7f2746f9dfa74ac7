"""Fused-kernel per-step pad elimination probe (ROADMAP item 1).

The production fused kernel (ops/pallas_spmv._dia_powers_fused) calls
jnp.pad(xcur, (wmax, wmax)) every step: one full extra copy (store +
load) of the L-length working vector per step, plus whatever Mosaic
spills for the SSA carry.  This variant keeps the recurrence state in
two explicit padded ping-pong scratch buffers: w_new is stored once into
the center of the next buffer and the 9 shifted reads are direct VMEM
slices — no per-step pad materialization.  The buffers are padded by
1024 (not wmax) so the center stays 1024-aligned and the shifted-read
misalignment pattern is identical to the baseline's.

Measures baseline vs no-pad on the standard 4.2M x 9-diag operator, s=8.
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
from ca_lanczos_tpu.ops.pallas_spmv import (
    _dia_powers_fused, dia_flat_padded, fused_tile,
)

PAD = 1024  # scratch center alignment pad (>= wmax, multiple of 1024)


@partial(
    jax.jit,
    static_argnames=("offsets", "s", "tile", "interpret", "W", "with_coefs"),
)
def dia_powers_nopad(
    dflat: jax.Array,
    x: jax.Array,
    coefs: jax.Array,
    offsets: Tuple[int, ...],
    s: int,
    tile: int = 65536,
    interpret: bool = False,
    W: Optional[int] = None,
    with_coefs: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    n = x.shape[0]
    nd = len(offsets)
    wmax = max(max(abs(o) for o in offsets), 1)
    if W is None:
        W = ((s * wmax + 1023) // 1024) * 1024
    assert W >= s * wmax and W % 1024 == 0
    T = min(tile, n)
    assert n % T == 0
    L = T + 2 * W
    NP = n + 2 * W
    num_tiles = n // T

    def kernel(coef_ref, dflat_ref, x_ref, out_ref, last_ref,
               d0, x0, d1, x1, pa, pb, sems):
        i = pl.program_id(0)
        num = pl.num_programs(0)
        slot = i % 2
        nxt = (i + 1) % 2

        def xfer(dscr, xscr, sl, tile_idx, go):
            for d in range(nd):
                cp = pltpu.make_async_copy(
                    dflat_ref.at[pl.ds(d * NP + tile_idx * T, L)],
                    dscr.at[pl.ds(d * L, L)],
                    sems.at[sl, d],
                )
                cp.start() if go else cp.wait()

            i32 = jnp.int32
            if num_tiles == 1:
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(i32(0), T)], xscr.at[pl.ds(i32(W), T)],
                    sems.at[sl, nd],
                )
                if go:
                    xscr[pl.ds(0, W)] = jnp.zeros((W,), xscr.dtype)
                    xscr[pl.ds(W + T, W)] = jnp.zeros((W,), xscr.dtype)
                    cp.start()
                else:
                    cp.wait()
                return

            def head():
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(i32(0), T + W)],
                    xscr.at[pl.ds(i32(W), T + W)],
                    sems.at[sl, nd],
                )
                if go:
                    xscr[pl.ds(0, W)] = jnp.zeros((W,), xscr.dtype)
                    cp.start()
                else:
                    cp.wait()

            def tail():
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(i32(n - (T + W)), T + W)],
                    xscr.at[pl.ds(i32(0), T + W)],
                    sems.at[sl, nd],
                )
                if go:
                    xscr[pl.ds(T + W, W)] = jnp.zeros((W,), xscr.dtype)
                    cp.start()
                else:
                    cp.wait()

            def interior():
                off = (tile_idx * (T // 1024) - (W // 1024)) * 1024
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(off, L)], xscr, sems.at[sl, nd]
                )
                cp.start() if go else cp.wait()

            pl.when(tile_idx == 0)(head)
            pl.when(tile_idx == num - 1)(tail)
            pl.when((tile_idx > 0) & (tile_idx < num - 1))(interior)

        @pl.when(i == 0)
        def _():
            xfer(d0, x0, 0, i * 0, True)

        @pl.when((i + 1 < num) & (nxt == 0))
        def _():
            xfer(d0, x0, 0, i + 1, True)

        @pl.when((i + 1 < num) & (nxt == 1))
        def _():
            xfer(d1, x1, 1, i + 1, True)

        def compute(dscr, xscr):
            # seed: copy the DMA'd window into pa's center; zero the rims
            pa[pl.ds(0, PAD)] = jnp.zeros((PAD,), pa.dtype)
            pa[pl.ds(PAD + L, PAD)] = jnp.zeros((PAD,), pa.dtype)
            pb[pl.ds(0, PAD)] = jnp.zeros((PAD,), pb.dtype)
            pb[pl.ds(PAD + L, PAD)] = jnp.zeros((PAD,), pb.dtype)
            pa[pl.ds(PAD, L)] = xscr[:]
            bufs = (pa, pb)
            prev = None
            for j in range(s):
                cur, nxtb = bufs[j % 2], bufs[(j + 1) % 2]
                terms = [
                    dscr[pl.ds(d * L, L)] * cur[pl.ds(PAD + off, L)]
                    for d, off in enumerate(offsets)
                ]
                while len(terms) > 1:
                    terms = [
                        terms[t] + terms[t + 1] if t + 1 < len(terms) else terms[t]
                        for t in range(0, len(terms), 2)
                    ]
                acc = terms[0]
                if with_coefs:
                    w_new = acc - coef_ref[j, 0] * cur[pl.ds(PAD, L)]
                    if j > 0:
                        w_new = w_new - coef_ref[j, 1] * prev[pl.ds(PAD, L)]
                    prev = cur
                else:
                    w_new = acc
                nxtb[pl.ds(PAD, L)] = w_new
                out_ref[j, :] = w_new[W : W + T]
            last_ref[:] = bufs[s % 2][pl.ds(PAD + W, T)]

        @pl.when(slot == 0)
        def _():
            xfer(d0, x0, 0, i, False)
            compute(d0, x0)

        @pl.when(slot == 1)
        def _():
            xfer(d1, x1, 1, i, False)
            compute(d1, x1)

    vma = getattr(jax.typeof(x), "vma", frozenset())
    with x64_trace_off(x.dtype):
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((s, T), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s, n), x.dtype, vma=vma),
                jax.ShapeDtypeStruct((n,), x.dtype, vma=vma),
            ],
            scratch_shapes=[
                pltpu.VMEM((nd * L,), x.dtype),
                pltpu.VMEM((L,), x.dtype),
                pltpu.VMEM((nd * L,), x.dtype),
                pltpu.VMEM((L,), x.dtype),
                pltpu.VMEM((L + 2 * PAD,), x.dtype),
                pltpu.VMEM((L + 2 * PAD,), x.dtype),
                pltpu.SemaphoreType.DMA((2, nd + 1)),
            ],
            interpret=interpret,
        )(coefs, dflat, x)


def make_op(n=4194304, nd=9, seed=0):
    rng = np.random.default_rng(seed)
    half = nd // 2
    offsets = tuple(range(-half, half + 1))
    data = (rng.standard_normal((nd, n)) / nd).astype(np.float32)
    return DiaMatrix(data=jnp.asarray(data), offsets=offsets)


def check_interpret():
    n, s = 8192, 4
    A = make_op(n=n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    coefs = jnp.asarray(rng.standard_normal((s, 2)) * 0.1, jnp.float32)
    W = ((s * 4 + 1023) // 1024) * 1024
    dflat = dia_flat_padded(A, W)
    V0, l0 = _dia_powers_fused(dflat, x, coefs, A.offsets, s, tile=4096,
                               interpret=True)
    V1, l1 = dia_powers_nopad(dflat, x, coefs, A.offsets, s, tile=4096,
                              interpret=True)
    # 1-2 ulp scatter from FMA-contraction ordering around the prev
    # term (step>=1); structurally identical (step 0 is bit-exact).
    np.testing.assert_allclose(np.asarray(V0), np.asarray(V1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=0, atol=1e-6)
    V0, V1 = np.asarray(V0), np.asarray(V1)
    assert np.array_equal(V0[0], V1[0]), "step 0 must be bit-exact"
    print("interpret parity: 1-ulp (step 0 bit-exact)", flush=True)


def bench_hw():
    n, s = 4194304, 8
    A = make_op(n=n)
    W = ((s * 4 + 1023) // 1024) * 1024
    dflat = dia_flat_padded(A, W)
    nnz = 9 * n
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    coefs = jnp.asarray(np.zeros((s, 2)), jnp.float32)

    for name, fn in (("baseline", _dia_powers_fused), ("nopad", dia_powers_nopad)):
        @partial(jax.jit, static_argnames=("reps",))
        def chain(v, reps, fn=fn):
            def body(i, v):
                _, last = fn(dflat, v, coefs, A.offsets, s, tile=65536,
                             with_coefs=False)
                return last
            return jnp.sum(lax.fori_loop(0, reps, body, v))

        lo, hi = 5, 45
        float(chain(x0, lo)); float(chain(x0, hi))
        def timed(reps, trials=3):
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                float(chain(x0, reps))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        t_lo, t_hi = timed(lo), timed(hi)
        rate = nnz * s * (hi - lo) / (t_hi - t_lo) / 1e9
        print(f"{name:9s}: {rate:.1f} Gnnz/s", flush=True)


if __name__ == "__main__":
    if "--hw" in sys.argv:
        bench_hw()
    else:
        import jax
        jax.config.update("jax_platforms", "cpu")
        check_interpret()
