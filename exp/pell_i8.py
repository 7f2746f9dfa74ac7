"""Probe: int8 lidx plane for PELL — does Mosaic take an (K, T) int8
block (tiling (32,128)) and an in-kernel i8->i32 convert, and is the
traffic saving worth the convert cost?  27-pt Laplacian, same protocol
as exp/pell_bench.py."""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ca_lanczos_tpu.ops.pell import LANES, SLOTS, PellMatrix


def laplacian_3d_27pt(m):
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (m, m))
    return (sp.kron(sp.kron(d1, d1), d1) * (1.0 / 27.0)).tocsr()


def _kernel_i8(
    coef_ref, span_ref, cbase_ref, vals_ref, lidx_ref, xblk_ref, vprev_ref,
    x_ref, out_ref, xspan, sems, *, B, KT, SR, NT, W,
):
    g = pl.program_id(0)
    slot = g % 2

    def span_dma(i, w, sl):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(span_ref[i, w], SR), :],
            xspan.at[pl.ds((sl * W + w) * SR, SR), :],
            sems.at[sl * W + w],
        )

    @pl.when(g == 0)
    def _():
        for w in range(W):
            span_dma(0, w, 0).start()

    @pl.when(g + 1 < NT)
    def _():
        for w in range(W):
            span_dma(g + 1, w, (g + 1) % 2).start()

    for w in range(W):
        span_dma(g, w, slot).wait()

    K = KT * SLOTS
    d = coef_ref[0]
    sb = coef_ref[1]
    for b in range(B):
        acc = jnp.zeros((SLOTS, LANES), out_ref.dtype)
        for kt in range(KT):
            vals = vals_ref[kt * SLOTS : (kt + 1) * SLOTS, b * LANES : (b + 1) * LANES]
            lidx = lidx_ref[
                kt * SLOTS : (kt + 1) * SLOTS, b * LANES : (b + 1) * LANES
            ].astype(jnp.int32)
            base = b * K + kt * SLOTS
            C = jnp.stack(
                [
                    xspan[slot * W * SR + cbase_ref[g % 8, base + u], :]
                    for u in range(SLOTS)
                ],
                axis=0,
            )
            acc = acc + vals * jnp.take_along_axis(C, lidx, axis=1)
        y = jnp.sum(acc, axis=0)
        out_ref[b, :] = y - d * xblk_ref[b, :] - sb * vprev_ref[b, :]


@partial(jax.jit, static_argnames=("tile", "k_slots", "sw", "n_win"))
def step_i8(vals, lidx8, cbase, span_row, x2, vprev2, coefs, tile, k_slots, sw, n_win):
    ntiles = span_row.shape[0]
    B = tile // LANES
    KT = k_slots // SLOTS
    SR = sw // LANES
    W = n_win
    g_out = ntiles * B
    kern = partial(_kernel_i8, B=B, KT=KT, SR=SR, NT=ntiles, W=W)
    return pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cbase.shape[1]), lambda g: (g // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k_slots, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_slots, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_out, LANES), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * n_win * SR, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2 * n_win,)),
        ],
    )(coefs, span_row, cbase, vals, lidx8, x2, vprev2, x2)


def main():
    m = 64
    a = laplacian_3d_27pt(m).astype(np.float32)
    n = a.shape[0]
    A = PellMatrix.from_scipy(a, tile=1024)
    lidx8 = jnp.asarray(np.asarray(A.lidx), jnp.int8)
    print(f"n={n} nnz={a.nnz} K={A.k_slots} W={A.n_win}", flush=True)

    rng = np.random.default_rng(0)
    x = np.asarray(rng.standard_normal(n), np.float32)
    n_x = A.n_x
    g_x = n_x // LANES
    x2 = jnp.asarray(np.pad(x, (0, n_x - n)).reshape(-1, LANES))
    coefs = jnp.zeros(2, jnp.float32)

    y2 = step_i8(A.vals, lidx8, A.cbase, A.span_row, x2, jnp.zeros_like(x2),
                 coefs, A.tile, A.k_slots, A.sw, A.n_win)
    y = np.asarray(y2).reshape(-1)[:n]
    err = np.max(np.abs(y - a @ x)) / np.max(np.abs(a @ x))
    print(f"i8 matvec rel err: {err:.2e}", flush=True)

    @partial(jax.jit, static_argnames=("reps",))
    def chain(v, reps):
        def body(i, v):
            y2 = step_i8(A.vals, lidx8, A.cbase, A.span_row, v,
                         jnp.zeros_like(v), coefs, A.tile, A.k_slots, A.sw, A.n_win)
            return jnp.pad(y2, ((0, g_x - y2.shape[0]), (0, 0)))
        return jnp.sum(lax.fori_loop(0, reps, body, v))

    lo, hi = 50, 450
    float(chain(x2, lo)); float(chain(x2, hi))

    def timed(reps, trials=3):
        return min(
            (lambda t0: (float(chain(x2, reps)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(trials)
        )

    t_lo, t_hi = timed(lo), timed(hi)
    rate = a.nnz * (hi - lo) / (t_hi - t_lo) / 1e9
    slot_rate = A.ntiles * A.k_slots * A.tile * (hi - lo) / (t_hi - t_lo) / 1e9
    print(f"PELL-i8 SpMV: {rate:.2f} Gnnz/s/chip ({slot_rate:.1f} Gslot/s)", flush=True)


main()
