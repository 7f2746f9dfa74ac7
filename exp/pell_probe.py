"""Time doctored PELL-kernel variants on hardware to locate the cycle
sink (results are numerically WRONG for most variants — timing only)."""
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ca_lanczos_tpu.ops.pell import LANES, SLOTS, PellMatrix
from exp.pell_bench import laplacian_3d_27pt


def make_kernel(variant, B, KT, CMAX, SR, NT):
    def kern(coef_ref, span_ref, cbase_ref, ccnt_ref, vals_ref, pidx_ref,
             xblk_ref, vprev_ref, x_ref, out_ref, xspan, sems):
        g = pl.program_id(0)
        slot = g % 2

        def span_dma(i, sl):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(span_ref[i], SR), :],
                xspan.at[pl.ds(sl * SR, SR), :],
                sems.at[sl],
            )

        @pl.when(g == 0)
        def _():
            span_dma(0, 0).start()

        @pl.when(g + 1 < NT)
        def _():
            span_dma(g + 1, (g + 1) % 2).start()

        span_dma(g, slot).wait()

        d = coef_ref[0]
        sb = coef_ref[1]
        for b in range(B):
            acc = jnp.zeros((SLOTS, LANES), out_ref.dtype)
            for kt in range(KT):
                vals = vals_ref[kt * SLOTS:(kt + 1) * SLOTS, b * LANES:(b + 1) * LANES]
                pidx = pidx_ref[kt * SLOTS:(kt + 1) * SLOTS, b * LANES:(b + 1) * LANES]
                lidx = pidx & 0xFF
                hi = pidx >> 8
                gathered = jnp.zeros((SLOTS, LANES), out_ref.dtype)
                if variant == "floor":
                    gathered = lidx.astype(out_ref.dtype) + hi.astype(out_ref.dtype)
                else:
                    for c in range(CMAX):
                        rel = cbase_ref[g, (b * KT + kt) * CMAX + c]
                        if variant == "static_row":
                            row = jnp.broadcast_to(xspan[c, :], (SLOTS, LANES))
                        else:
                            row = jnp.broadcast_to(xspan[slot * SR + rel, :], (SLOTS, LANES))
                        if variant == "no_gather":
                            gc = row
                        elif variant == "no_row":
                            gc = jnp.take_along_axis(
                                jnp.broadcast_to(xspan[0, :], (SLOTS, LANES)), lidx, axis=1
                            )
                        else:
                            gc = jnp.take_along_axis(row, lidx, axis=1)
                        if variant == "no_select":
                            gathered = gathered + gc
                        else:
                            gathered = gathered + jnp.where(hi == c, gc, 0.0)
                acc = acc + vals * gathered
            y = jnp.sum(acc, axis=0)
            out_ref[b, :] = y - d * xblk_ref[b, :] - sb * vprev_ref[b, :]

    return kern


@partial(jax.jit, static_argnames=("tile", "k_slots", "cmax", "sw", "variant", "reps"))
def chain(vals, pidx, cbase, ccnt, span_row, x2, coefs, tile, k_slots, cmax,
          sw, variant, reps):
    ntiles = cbase.shape[0]
    B = tile // LANES
    KT = k_slots // SLOTS
    SR = sw // LANES
    g_out = ntiles * B
    g_x = x2.shape[0]
    kern = make_kernel(variant, B, KT, cmax, SR, ntiles)
    call = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k_slots, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_slots, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_out, LANES), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * SR, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def body(i, v):
        y2 = call(coefs, span_row, cbase, ccnt, vals, pidx, v, jnp.zeros_like(v), v)
        return jnp.pad(y2, ((0, g_x - y2.shape[0]), (0, 0)))

    return jnp.sum(lax.fori_loop(0, reps, body, x2))


def main():
    a = laplacian_3d_27pt(64).astype(np.float32)
    n = a.shape[0]
    rng = np.random.default_rng(0)
    x = np.asarray(rng.standard_normal(n), np.float32)
    lo, hi_r = 50, 450
    for tile in (1024, 2048, 4096):
        A = PellMatrix.from_scipy(a, tile=tile, cmax=8)
        print(f"tile={tile} K={A.k_slots} cmax_eff={A.cmax} sw={A.sw} "
              f"ntiles={A.ntiles}", flush=True)
        x2 = jnp.asarray(np.pad(x, (0, A.n_x - n)).reshape(-1, LANES))
        coefs = jnp.zeros(2, jnp.float32)
        args = (A.vals, A.pidx, A.cbase, A.ccnt, A.span_row, x2, coefs,
                A.tile, A.k_slots, A.cmax, A.sw)
        variants = (
            ("full", "no_select", "no_gather", "no_row", "static_row", "floor")
            if tile == 1024 else ("full",)
        )
        for variant in variants:
            float(chain(*args, variant, lo))
            float(chain(*args, variant, hi_r))

            def timed(reps):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(chain(*args, variant, reps))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            t_lo, t_hi = timed(lo), timed(hi_r)
            per = (t_hi - t_lo) / (hi_r - lo)
            rate = a.nnz / per / 1e9
            print(f"  {variant:12s}: {per*1e6:8.1f} us/matvec  {rate:6.2f} Gnnz/s",
                  flush=True)


main()
