"""Cost-split probe for the PELL kernel inner loop (ROADMAP item 2).

Variants (V1-V3 produce WRONG results on purpose — identical memory
traffic and loop structure, with one cost component removed each):
  V0  baseline kernel (correct)
  V1  C built from ONE contiguous dynamic (8,128) slice + same-shape
      sublane gather (models the grouped-chunk encoding)
  V2  no lane gather (C consumed directly)
  V3  no C build at all (vals * xblk — pure streaming floor)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ca_lanczos_tpu.ops.pell import LANES, SLOTS, PellMatrix


def make_kernel(B, KT, SR, NT, W, variant):
    def kernel(coef_ref, span_ref, cbase_ref, vals_ref, lidx_ref, xblk_ref,
               vprev_ref, x_ref, out_ref, xspan, sems):
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
                if variant == 0:
                    C = jnp.stack(
                        [xspan[slot * W * SR + cbase_ref[g % 8, base + u], :]
                         for u in range(SLOTS)],
                        axis=0,
                    )
                    acc = acc + vals * jnp.take_along_axis(C, lidx, axis=1)
                elif variant == 1:
                    # one contiguous dynamic 8-row slice + sublane gather
                    grp = cbase_ref[g % 8, base]  # pretend: group start
                    Cg = xspan[pl.ds(slot * W * SR + (grp // 8) * 8, 8), :]
                    sub_idx = lidx % 8  # pretend sublane-binding plane
                    C = jnp.take_along_axis(Cg, sub_idx, axis=0)
                    acc = acc + vals * jnp.take_along_axis(C, lidx, axis=1)
                elif variant == 2:
                    C = jnp.stack(
                        [xspan[slot * W * SR + cbase_ref[g % 8, base + u], :]
                         for u in range(SLOTS)],
                        axis=0,
                    )
                    acc = acc + vals * C
                else:
                    acc = acc + vals * xblk_ref[b, :][None, :]
            y = jnp.sum(acc, axis=0)
            out_ref[b, :] = y - d * xblk_ref[b, :] - sb * vprev_ref[b, :]

    return kernel


def main():
    m = 64
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (m, m))
    a = (sp.kron(sp.kron(d1, d1), d1) * (1 / 27.0)).tocsr().astype(np.float32)
    n = a.shape[0]
    A = PellMatrix.from_scipy(a, tile=1024)
    T, K, sw, W = A.tile, A.k_slots, A.sw, A.n_win
    B = T // LANES
    KT = K // SLOTS
    SR = sw // LANES
    ntiles = A.ntiles
    n_x = A.n_x
    g_x = n_x // LANES
    print(f"n={n} K={K} sw={sw} W={W} ntiles={ntiles} packing={a.nnz/(ntiles*K*T):.2f}",
          flush=True)

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(np.pad(rng.standard_normal(n).astype(np.float32), (0, n_x - n)).reshape(-1, LANES))
    coefs = jnp.zeros(2, jnp.float32)
    vals_p, lidx_p, cbase_p, span_p = A.vals, A.lidx, A.cbase, A.span_row

    for variant in (0, 1, 2, 3):
        kern = make_kernel(B, KT, SR, ntiles, W, variant)

        @partial(jax.jit, static_argnames=("reps",))
        def chain(v, reps, kern=kern):
            def call(v):
                y = pl.pallas_call(
                    kern,
                    grid=(ntiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((8, cbase_p.shape[1]), lambda g: (g // 8, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((K, T), lambda g: (g, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((K, T), lambda g: (g, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec((B, LANES), lambda g: (g, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((ntiles * B, LANES), jnp.float32),
                    scratch_shapes=[
                        pltpu.VMEM((2 * W * SR, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((2 * W,)),
                    ],
                )(coefs, span_p, cbase_p, vals_p, lidx_p, v, jnp.zeros_like(v), v)
                return jnp.pad(y, ((0, g_x - y.shape[0]), (0, 0)))

            def body(i, v):
                return call(v)

            return jnp.sum(lax.fori_loop(0, reps, body, v))

        lo, hi = 50, 450
        float(chain(x2, lo)); float(chain(x2, hi))

        def timed(r):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); float(chain(x2, r)); ts.append(time.perf_counter() - t0)
            return min(ts)

        t_lo, t_hi = timed(lo), timed(hi)
        rate = a.nnz * (hi - lo) / (t_hi - t_lo) / 1e9
        slot_rate = ntiles * K * T * (hi - lo) / (t_hi - t_lo) / 1e9
        print(f"V{variant}: {rate:.2f} Gnnz/s  ({slot_rate:.1f} Gslot/s)", flush=True)


main()
