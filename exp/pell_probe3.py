"""Grouped-chunk PELL design probe (ROADMAP item 2, round-2 follow-up).

pell_probe2 established: 8 dynamic single-row reads per slot-tile cost
~47% of runtime; an ALIGNED (8,128) contiguous slice + same-shape
sublane gather recovers 2/3 of it.  The encoder constraint that makes
an aligned group usable grows K.  These variants price the RELAXED
constraints that keep K flat (all produce wrong values on purpose —
identical traffic/loop structure, only the C-build mechanism changes;
each variant streams exactly the planes its encoding would):

  V0  baseline (correct): 8 scattered dynamic row reads  (5 B/slot)
  V4  ONE (8,128) dynamic slice at UNALIGNED base + sublane gather
      (spread-8 window: any 8 consecutive scratch rows)  (5 B/slot,
      sub index faked from lidx — prices the mechanism only)
  V5  TWO (4,128) dynamic slices at unaligned bases, stacked
      (two independent spread-4 windows per slot-tile)   (5 B/slot)
  V6  V4 + separate int8 sub-index plane                 (6 B/slot)
  V7  V4 with ONE int16 plane carrying sub|lane packed   (6 B/slot,
      one load) — prices int16 (16,128)-tile slicing at 8 rows
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


def make_kernel(B, KT, SR, NT, W, variant, nplanes):
    def kernel(*refs):
        (coef_ref, span_ref, cbase_ref, vals_ref), rest = refs[:4], refs[4:]
        planes = rest[:nplanes]
        xblk_ref, vprev_ref, x_ref, out_ref, xspan, sems = rest[nplanes:]
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
                vals = vals_ref[kt * SLOTS : (kt + 1) * SLOTS,
                                b * LANES : (b + 1) * LANES]
                base = b * K + kt * SLOTS

                def blk(p):
                    return p[kt * SLOTS : (kt + 1) * SLOTS,
                             b * LANES : (b + 1) * LANES].astype(jnp.int32)

                if variant == 0:
                    lidx = blk(planes[0])
                    C = jnp.stack(
                        [xspan[slot * W * SR + cbase_ref[g % 8, base + u], :]
                         for u in range(SLOTS)],
                        axis=0,
                    )
                    acc = acc + vals * jnp.take_along_axis(C, lidx, axis=1)
                elif variant == 4:
                    lidx = blk(planes[0])
                    b0 = cbase_ref[g % 8, base]  # UNALIGNED base
                    Cg = xspan[pl.ds(slot * W * SR + b0, 8), :]
                    C = jnp.take_along_axis(Cg, lidx % 8, axis=0)
                    acc = acc + vals * jnp.take_along_axis(C, lidx, axis=1)
                elif variant == 5:
                    lidx = blk(planes[0])
                    b0 = cbase_ref[g % 8, base]
                    b1 = cbase_ref[g % 8, base + 1]
                    Cg = jnp.concatenate(
                        [xspan[pl.ds(slot * W * SR + b0, 4), :],
                         xspan[pl.ds(slot * W * SR + b1, 4), :]],
                        axis=0,
                    )
                    C = jnp.take_along_axis(Cg, lidx % 8, axis=0)
                    acc = acc + vals * jnp.take_along_axis(C, lidx, axis=1)
                elif variant == 6:
                    lidx = blk(planes[0])
                    sidx = blk(planes[1])
                    b0 = cbase_ref[g % 8, base]
                    Cg = xspan[pl.ds(slot * W * SR + b0, 8), :]
                    C = jnp.take_along_axis(Cg, sidx % 8, axis=0)
                    acc = acc + vals * jnp.take_along_axis(C, lidx, axis=1)
                else:  # V7: one int16 plane carries sub|lane
                    idx = blk(planes[0])
                    b0 = cbase_ref[g % 8, base]
                    Cg = xspan[pl.ds(slot * W * SR + b0, 8), :]
                    C = jnp.take_along_axis(Cg, idx >> 7, axis=0)
                    acc = acc + vals * jnp.take_along_axis(C, idx & 127, axis=1)
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
    print(f"n={n} K={K} sw={sw} W={W} ntiles={ntiles} "
          f"packing={a.nnz/(ntiles*K*T):.2f}", flush=True)

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(np.pad(rng.standard_normal(n).astype(np.float32),
                            (0, n_x - n)).reshape(-1, LANES))
    coefs = jnp.zeros(2, jnp.float32)
    vals_p, lidx_p, cbase_p, span_p = A.vals, A.lidx, A.cbase, A.span_row
    # clamp fake bases so dynamic slices stay in bounds
    cb = np.asarray(cbase_p)
    cb = np.minimum(cb, max(W * SR - 8, 0))
    cbase_c = jnp.asarray(cb)
    idx16 = jnp.asarray(np.asarray(lidx_p, np.int16))

    plane_sets = {0: [lidx_p], 4: [lidx_p], 5: [lidx_p],
                  6: [lidx_p, lidx_p], 7: [idx16]}

    for variant in (0, 4, 5, 6, 7):
        planes = plane_sets[variant]
        kern = make_kernel(B, KT, SR, ntiles, W, variant, len(planes))

        @partial(jax.jit, static_argnames=("reps",))
        def chain(v, reps, kern=kern, planes=tuple(planes)):
            def call(v):
                y = pl.pallas_call(
                    kern,
                    grid=(ntiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((8, cbase_c.shape[1]), lambda g: (g // 8, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((K, T), lambda g: (g, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [
                        pl.BlockSpec((K, T), lambda g: (g, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in planes
                    ] + [
                        pl.BlockSpec((B, LANES), lambda g: (g, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((B, LANES), lambda g: (g, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec((B, LANES), lambda g: (g, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((ntiles * B, LANES), jnp.float32),
                    scratch_shapes=[
                        pltpu.VMEM((2 * W * SR, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((2 * W,)),
                    ],
                )(coefs, span_p, cbase_c, vals_p, *planes, v,
                  jnp.zeros_like(v), v)
                return jnp.pad(y, ((0, g_x - y.shape[0]), (0, 0)))

            def body(i, v):
                return call(v)

            return jnp.sum(lax.fori_loop(0, reps, body, v))

        try:
            lo, hi = 50, 450
            float(chain(x2, lo)); float(chain(x2, hi))

            def timed(r):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter(); float(chain(x2, r))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            t_lo, t_hi = timed(lo), timed(hi)
            rate = a.nnz * (hi - lo) / (t_hi - t_lo) / 1e9
            slot_rate = ntiles * K * T * (hi - lo) / (t_hi - t_lo) / 1e9
            print(f"V{variant}: {rate:.2f} Gnnz/s  ({slot_rate:.1f} Gslot/s)",
                  flush=True)
        except Exception as e:
            print(f"V{variant}: FAIL {type(e).__name__}: "
                  f"{str(e)[:180]}", flush=True)


main()
