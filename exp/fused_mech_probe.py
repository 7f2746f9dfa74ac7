"""Price the fused-kernel per-step COMPUTE mechanisms (ROADMAP item 1).

The fused kernel is VPU-bound (~57% peak) on ~9 shifted reads + FMAs
per element per step.  This probe times three in-VMEM mechanisms on a
resident tile (no HBM streaming, grid = repeat count, s steps per grid
iteration), isolating pure per-step vector work:

  M0  baseline: vp = jnp.pad(xcur, wmax); 9 slices of vp (8 misaligned)
      — the production compute loop today.
  M1  no-pad ping-pong: w_new stored once into a 1024-rim padded
      buffer; 9 direct slices (8 misaligned).  Saves the per-step pad
      copy.
  M2  interleaved J=8: the tile is J row-sections [r*Lq, (r+1)*Lq)
      with x_il[r*Lq+q] = x[J*q+r]; term o for output row r reads
      row r+o aligned when 0<=r+o<J (72%), else the wrapped row at
      q+-1 (misaligned by one element, 28%).  Data planes pre-permuted
      to match.  Prices the aligned-read payoff net of layout waste.

All three do identical FMA counts per owned element; M2 computes on
row halos (+2*1024/Lq waste).  Expected: M1 ~= M0 + pad saving; M2
wins iff misaligned 1-D reads cost >~1 extra op each.
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NDIAG = 9
OFFS = tuple(range(-4, 5))
S = 8
PAD = 1024


def mk_m0(L, s):
    wmax = 4

    def kernel(data_ref, x_ref, out_ref):
        xcur = x_ref[:]
        for j in range(s):
            vp = jnp.pad(xcur, (wmax, wmax))
            terms = [
                data_ref[pl.ds(d * L, L)]
                * lax.slice_in_dim(vp, wmax + off, wmax + off + L, axis=0)
                for d, off in enumerate(OFFS)
            ]
            while len(terms) > 1:
                terms = [
                    terms[t] + terms[t + 1] if t + 1 < len(terms) else terms[t]
                    for t in range(0, len(terms), 2)
                ]
            xcur = terms[0]
        out_ref[:] = xcur[:1024]

    return kernel, [], L


def mk_m1(L, s):
    def kernel(data_ref, x_ref, out_ref, pa, pb):
        pa[pl.ds(0, PAD)] = jnp.zeros((PAD,), pa.dtype)
        pa[pl.ds(PAD + L, PAD)] = jnp.zeros((PAD,), pa.dtype)
        pb[pl.ds(0, PAD)] = jnp.zeros((PAD,), pb.dtype)
        pb[pl.ds(PAD + L, PAD)] = jnp.zeros((PAD,), pb.dtype)
        pa[pl.ds(PAD, L)] = x_ref[:]
        bufs = (pa, pb)
        for j in range(s):
            cur, nxt = bufs[j % 2], bufs[(j + 1) % 2]
            terms = [
                data_ref[pl.ds(d * L, L)] * cur[pl.ds(PAD + off, L)]
                for d, off in enumerate(OFFS)
            ]
            while len(terms) > 1:
                terms = [
                    terms[t] + terms[t + 1] if t + 1 < len(terms) else terms[t]
                    for t in range(0, len(terms), 2)
                ]
            nxt[pl.ds(PAD, L)] = terms[0]
        out_ref[:] = bufs[s % 2][pl.ds(PAD, 1024)]

    scratch = [pltpu.VMEM((L + 2 * PAD,), jnp.float32) for _ in range(2)]
    return kernel, scratch, L


def mk_m2(L, s, J=8):
    """L here is the TOTAL element count; rows Lq = L // J."""
    Lq = L // J
    assert Lq % 1024 == 0

    def kernel(data_ref, x_ref, out_ref, pa, pb):
        # data_ref layout: term d, row r at [(d * J + r) * Lq, Lq)
        pa[pl.ds(0, PAD)] = jnp.zeros((PAD,), pa.dtype)
        pa[pl.ds(PAD + L, PAD)] = jnp.zeros((PAD,), pa.dtype)
        pb[pl.ds(0, PAD)] = jnp.zeros((PAD,), pb.dtype)
        pb[pl.ds(PAD + L, PAD)] = jnp.zeros((PAD,), pb.dtype)
        pa[pl.ds(PAD, L)] = x_ref[:]
        bufs = (pa, pb)
        for j in range(s):
            cur, nxt = bufs[j % 2], bufs[(j + 1) % 2]
            for r in range(J):
                terms = []
                for d, off in enumerate(OFFS):
                    src = r + off
                    if 0 <= src < J:
                        rd = cur[pl.ds(PAD + src * Lq, Lq)]
                    elif src >= J:
                        rd = cur[pl.ds(PAD + (src - J) * Lq + 1, Lq)]
                    else:
                        rd = cur[pl.ds(PAD + (src + J) * Lq - 1, Lq)]
                    terms.append(data_ref[pl.ds((d * J + r) * Lq, Lq)] * rd)
                while len(terms) > 1:
                    terms = [
                        terms[t] + terms[t + 1] if t + 1 < len(terms) else terms[t]
                        for t in range(0, len(terms), 2)
                    ]
                nxt[pl.ds(PAD + r * Lq, Lq)] = terms[0]
        out_ref[:] = bufs[s % 2][pl.ds(PAD, 1024)]

    scratch = [pltpu.VMEM((L + 2 * PAD,), jnp.float32) for _ in range(2)]
    return kernel, scratch, L


def run(mk, L, s, reps, interpret=False, data=None, x=None):
    kernel, scratch, L = mk(L, s)
    if data is None:
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.standard_normal(NDIAG * L) / NDIAG, jnp.float32)
        x = jnp.asarray(rng.standard_normal(L), jnp.float32)

    @partial(jax.jit, static_argnames=("n_iter",))
    def go(data, x, n_iter):
        return pl.pallas_call(
            kernel,
            grid=(n_iter,),
            in_specs=[
                pl.BlockSpec((NDIAG * L,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((L,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1024,), lambda i: (0,), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1024,), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(data, x)

    return go(data, x, reps), data, x


def check_interpret():
    """M0/M1 bit-comparable on the same data; M2 on permuted data must
    reproduce M0's owned values after inverse permutation."""
    L, s, J = 8192, 3, 8
    rng = np.random.default_rng(0)
    data = np.asarray(rng.standard_normal((NDIAG, L)) / NDIAG, np.float32)
    x = np.asarray(rng.standard_normal(L), np.float32)

    y0, _, _ = run(mk_m0, L, s, 1, interpret=True,
                   data=jnp.asarray(data.reshape(-1)), x=jnp.asarray(x))
    y1, _, _ = run(mk_m1, L, s, 1, interpret=True,
                   data=jnp.asarray(data.reshape(-1)), x=jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    # M2: permute x and data into J-interleaved layout
    Lq = L // J
    perm = np.arange(L).reshape(Lq, J).T.reshape(-1)  # il[k] = orig[perm[k]]
    x_il = x[perm]
    data_il = np.stack([d[perm] for d in data]).reshape(NDIAG, J, Lq)
    data_flat = data_il.reshape(-1)
    y2, _, _ = run(mk_m2, L, s, 1, interpret=True,
                   data=jnp.asarray(data_flat), x=jnp.asarray(x_il))
    # compare owned interior (avoid rim effects): original index =
    # perm[k] for interleaved position k in [0, 1024)
    # numpy oracle: s steps of the 9-term stencil with zero boundary
    xv = x.astype(np.float64)
    for _ in range(s):
        acc = np.zeros(L)
        for d, off in enumerate(OFFS):
            sh = np.zeros(L)
            if off >= 0:
                sh[: L - off] = xv[off:]
            else:
                sh[-off:] = xv[:L + off]
            acc += data[d].astype(np.float64) * sh
        xv = acc
    y0v, y2v = np.asarray(y0), np.asarray(y2)
    np.testing.assert_allclose(y0v, xv[:1024], rtol=2e-5, atol=1e-6)
    ok = 0
    for k in range(1024):
        oi = perm[k]
        # interior of the interleaved row only (rim pollution depth s)
        if s <= (k % Lq) < Lq - s:
            np.testing.assert_allclose(y2v[k], xv[oi], rtol=2e-5, atol=1e-6)
            ok += 1
    print(f"interpret parity ok (M0==M1==oracle, M2 matched {ok} pts)",
          flush=True)


def bench_hw():
    L = 147456  # 18432 * 8; ~576 KB tile, data 5.3 MB — VMEM resident
    s = S
    for name, mk in (("M0 pad", mk_m0), ("M1 nopad", mk_m1),
                     ("M2 ilv8", mk_m2)):
        y, data, x = run(mk, L, s, 2)  # compile
        float(jnp.sum(y))

        def timed(reps, trials=3):
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                yy, _, _ = run(mk, L, s, reps, data=data, x=x)
                float(jnp.sum(yy))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        lo, hi = 20, 120
        t_lo, t_hi = timed(lo), timed(hi)
        rate = L * s * NDIAG * (hi - lo) / (t_hi - t_lo) / 1e9
        print(f"{name:9s}: {rate:7.1f} Gnnz/s-equiv (VMEM-resident compute)",
              flush=True)


if __name__ == "__main__":
    if "--hw" in sys.argv:
        bench_hw()
    else:
        jax.config.update("jax_platforms", "cpu")
        check_interpret()
