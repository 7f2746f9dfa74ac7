"""Probe: does take_along_axis(axis=0) lower on (8,128) vregs (sublane
dynamic_gather), and what does the 2-gather PELL scheme cost vs the
c-loop?  Timing-only kernels (numerics deliberately fake)."""
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

LANES = 128
SLOTS = 8


def correctness():
    """Sublane gather on one vreg: out[i,j] = x[idx[i,j], j]."""
    def kern(x_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)

    x = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 8, (8, 128)).astype(np.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.asarray(x), jnp.asarray(idx))
    expect = np.take_along_axis(x, idx, axis=0)
    ok = np.array_equal(np.asarray(out), expect)
    print(f"sublane-gather correctness: {ok}", flush=True)
    return ok


def timing(KT=4, CMAX=7, B=8, NT=256, SR=88):
    """Compare c-loop vs 2-gather inner loops at PELL-like shapes."""
    K = KT * SLOTS
    tile = B * LANES

    def make(variant):
        def kern(vals_ref, pidx_ref, xblk_ref, out_ref, xspan):
            for b in range(B):
                acc = jnp.zeros((SLOTS, LANES), jnp.float32)
                for kt in range(KT):
                    vals = vals_ref[kt * SLOTS:(kt + 1) * SLOTS, b * LANES:(b + 1) * LANES]
                    pidx = pidx_ref[kt * SLOTS:(kt + 1) * SLOTS, b * LANES:(b + 1) * LANES]
                    lidx = pidx & 0xFF
                    hi = (pidx >> 8) & 0x7
                    if variant == "cloop":
                        gathered = jnp.zeros((SLOTS, LANES), jnp.float32)
                        for c in range(CMAX):
                            rel = (b * KT + kt + c) % SR
                            row = jnp.broadcast_to(xspan[rel, :], (SLOTS, LANES))
                            gc = jnp.take_along_axis(row, lidx, axis=1)
                            gathered = gathered + jnp.where(hi == c, gc, 0.0)
                    else:
                        # build chunks tile: 8 dynamic row reads
                        rows = [xspan[(b * KT + kt + c) % SR, :] for c in range(SLOTS)]
                        C = jnp.stack(rows, axis=0)
                        t1 = jnp.take_along_axis(C, lidx, axis=1)
                        gathered = jnp.take_along_axis(t1, hi, axis=0)
                    acc = acc + vals * gathered
                out_ref[...] = acc + xblk_ref[...]

        return kern

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((NT * K, tile)), jnp.float32)
    pidx = jnp.asarray(rng.integers(0, 1 << 11, (NT * K, tile)), jnp.int32)
    xspan_host = jnp.asarray(rng.standard_normal((SR, LANES)), jnp.float32)

    for variant in ("cloop", "twogather"):
        call = pl.pallas_call(
            make(variant),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((K, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SLOTS, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SLOTS, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT * SLOTS, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((SR, LANES), jnp.float32)],
        )

        @partial(jax.jit, static_argnames=("reps",))
        def chain(v, p, reps):
            def body(i, s):
                return call(v, p, s)

            init = jnp.zeros((NT * SLOTS, LANES), jnp.float32)
            return jnp.sum(lax.fori_loop(0, reps, body, init))

        lo, hi_r = 50, 450
        try:
            float(chain(vals, pidx, lo))
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        float(chain(vals, pidx, hi_r))

        def timed(reps):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(vals, pidx, reps))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_lo, t_hi = timed(lo), timed(hi_r)
        per = (t_hi - t_lo) / (hi_r - lo)
        slots = NT * K * tile
        print(f"{variant:10s}: {per*1e6:8.1f} us/sweep  {slots/per/1e9:6.1f} Gslot/s",
              flush=True)


if correctness():
    timing()
