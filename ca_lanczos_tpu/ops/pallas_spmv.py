"""Pallas TPU kernel for the banded (DIA) matrix-powers step.

The XLA lowering of the shifted-slice DIA SpMV (ops.spmv._dia_matvec)
materializes the padded vector and runs one fused pass per diagonal,
costing several HBM round trips per element.  This kernel performs the
whole step in ONE pass per row tile:

    y[i] = sum_d data[d, i] * x[i + off_d]  -  dcoef * x[i]  -  scoef * v_prev[i]

* matrix data is streamed tile-by-tile through VMEM via BlockSpec;
* the vector tile plus its (static) halo is DMA'd from HBM into VMEM
  scratch, so every shifted read is a VMEM slice — no padded-array
  materialization, no re-reads;
* the Newton shift (dcoef) and the modified-Newton conjugate-pair
  correction (scoef * v_prev, reference matrix_powers_newton.m:30-47)
  fuse into the same pass (zero coefficients give the monomial basis).

Traffic per row per step: ndiags*4 B (data) + ~4 B (x) + 4 B (y) —
the HBM speed-of-light for this operator class.  One kernel launch per
power step; the s-step chain is unrolled under one jit.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ca_lanczos_tpu.ops._mosaic import x64_trace_off
from ca_lanczos_tpu.ops.spmv import DiaMatrix


def _dia_step_kernel(
    coef_ref,  # SMEM (2,): [dcoef, scoef]
    data_ref,  # VMEM (ndiags, T) tile
    vprev_ref,  # VMEM (T,) tile
    xpad_ref,  # ANY/HBM (n + 2W,) full padded vector
    out_ref,  # VMEM (T,) tile
    scratch,  # VMEM (T + 2W,) halo'd vector tile
    sem,
    *,
    offsets: Tuple[int, ...],
    T: int,
    W: int,
):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xpad_ref.at[pl.ds(i * T, T + 2 * W)], scratch, sem
    )
    dma.start()
    dma.wait()
    acc = jnp.zeros((T,), out_ref.dtype)
    for d, off in enumerate(offsets):
        acc = acc + data_ref[d, :] * scratch[W + off : W + off + T]
    dcoef = coef_ref[0]
    scoef = coef_ref[1]
    out_ref[:] = acc - dcoef * scratch[W : W + T] - scoef * vprev_ref[:]


def pick_tile(n: int, tile: int = 65536) -> int:
    """Largest divisor of n that is <= tile and a multiple of the Mosaic
    1-D f32 tiling unit (1024); 0 if none exists (caller falls back to
    the XLA path)."""
    if n % 1024 != 0:
        return 0
    t = min(tile, n)
    t -= t % 1024
    while t >= 1024 and n % t != 0:
        t -= 1024
    return t if t >= 1024 else 0


@partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def _dia_power_step(
    data: jax.Array,  # (ndiags, n)
    x: jax.Array,  # (n,)
    v_prev: jax.Array,  # (n,)
    coefs: jax.Array,  # (2,) [dcoef, scoef]
    offsets: Tuple[int, ...],
    tile: int = 65536,
    interpret: bool = False,
) -> jax.Array:
    n = x.shape[0]
    out_dt = x.dtype
    if not interpret and jnp.dtype(x.dtype).itemsize == 8:
        # Kernel seam (the ilv/PELL engines' contract, parallel/step.py
        # body_ilv): Mosaic kernels are f32-only — a 64-bit operand
        # recurses Mosaic's convert-element-type lowering (jax 0.9),
        # and x64_trace_off must leave genuine 64-bit operands alone.
        # f64 driver state casts here only; the result returns at the
        # caller's dtype.  Interpret mode (CPU f64 parity tests) is
        # exempt: those need true f64 compute.
        x = x.astype(jnp.float32)
        v_prev = v_prev.astype(jnp.float32)
        coefs = coefs.astype(jnp.float32)
        data = data.astype(jnp.float32)
    W = max(max(abs(o) for o in offsets), 1)
    # Mosaic tiles 1-D f32 memrefs in chunks of 1024; DMA slice shapes
    # must be multiples of that, so round the halo up accordingly.
    W = ((W + 1023) // 1024) * 1024
    T = min(tile, n)
    assert n % T == 0, f"n={n} must be a multiple of the tile {T}"
    grid = (n // T,)

    xpad = jnp.pad(x, (W, W))
    kernel = partial(_dia_step_kernel, offsets=offsets, T=T, W=W)
    with x64_trace_off(x.dtype):
        out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs
            pl.BlockSpec((data.shape[0], T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # xpad stays in HBM
        ],
        out_specs=pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T + 2 * W,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(coefs, data, v_prev, xpad)
    return out.astype(out_dt)


def matrix_powers_dia_pallas(
    A: DiaMatrix,
    q: jax.Array,
    s: int,
    diag=None,
    sub=None,
    tile: int = 65536,
    interpret: bool = False,
) -> jax.Array:
    """[q, P_1(A)q, ..., P_s(A)q] via the Pallas step kernel.

    diag/sub are the Newton three-term coefficients (None = monomial).
    Returns (n, s+1) like ops.matrix_powers.matrix_powers_monomial.
    Falls back to the XLA path when n does not admit an aligned tile.
    """
    n = q.shape[0]
    t = pick_tile(n, tile)
    if t == 0:
        from ca_lanczos_tpu.ops.matrix_powers import _newton_scan

        z = jnp.zeros(s, q.dtype)
        dj = z if diag is None else jnp.asarray(np.asarray(diag), q.dtype)
        sj = z if sub is None else jnp.asarray(np.asarray(sub), q.dtype)
        return _newton_scan(A, q, s, dj, sj)
    tile = t
    dtype = q.dtype
    if diag is None:
        diag = np.zeros(s)
    if sub is None:
        sub = np.zeros(s)
    diag = np.asarray(diag, np.float64)
    sub = np.asarray(sub, np.float64)

    cols = [q]
    v_prev = jnp.zeros_like(q)
    v = q
    for k in range(s):
        coefs = jnp.asarray([diag[k], sub[k]], dtype)
        w = _dia_power_step(
            A.data, v, v_prev, coefs, A.offsets, tile=tile, interpret=interpret
        )
        cols.append(w)
        v_prev, v = v, w
    return jnp.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# Fused s-step kernel: ONE matrix read per s steps.
#
# The single-step kernel above re-reads the matrix from HBM every step
# (40 B/row/step for 9 diagonals).  This kernel DMAs each row tile's
# matrix slice into VMEM once, with an s*w-deep halo, and runs ALL s
# recurrence steps on it before moving on — the communication-avoiding
# trade applied to HBM itself (~9 B/row/step; measured 1.8x the
# single-step kernel on v5e).  Tile halos pollute inward by w per step,
# so W >= s*w keeps the owned centers exact (bit-identical to the XLA
# path).  Matrix data rides a flat 1-D layout (ndiags concatenated,
# per-diagonal W-padding) because Mosaic requires sublane-aligned 2-D DMA
# shapes and ndiags is arbitrary.
# ---------------------------------------------------------------------------


def dia_flat_padded(A: DiaMatrix, W: int) -> jax.Array:
    """(ndiags * (n + 2W),) flat layout consumed by the fused kernel."""
    return jnp.pad(A.data, ((0, 0), (W, W))).reshape(-1)


def fused_tile(n: int, nd: int, W: int, s: int, dtype, tile: int = 65536) -> int:
    """Largest VMEM-feasible row tile for the fused kernel, or 0 when the
    shape does not admit one (caller falls back to the per-step/XLA path).
    Two scratch sets + the pipelined output block must fit VMEM (~16MB)."""
    itemsize = jnp.dtype(dtype).itemsize
    t = pick_tile(n, tile)
    while t > 0 and (2 * (nd + 1) * (t + 2 * W) + 2 * s * t) * itemsize > 13 * 2**20:
        t = pick_tile(n, t // 2)
    if t == 0 or W >= t:
        return 0
    return t


@partial(
    jax.jit,
    static_argnames=("offsets", "s", "tile", "interpret", "W", "with_coefs"),
)
def _dia_powers_fused(
    dflat: jax.Array,  # from dia_flat_padded
    x: jax.Array,  # (n,) UNPADDED
    coefs: jax.Array,  # (s, 2) [diag, sub] per step
    offsets: Tuple[int, ...],
    s: int,
    tile: int = 65536,
    interpret: bool = False,
    W: Optional[int] = None,
    with_coefs: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (V (s, n), last (n,)): the s recurrence vectors (excluding
    x itself) plus the final vector as its own contiguous output.

    Double-buffered: tile i+1's matrix/vector windows stream in while
    tile i computes (two scratch sets selected by pl.when — Mosaic cannot
    slice scratch along an unaligned leading dim, so the buffers are
    separate refs and the compute body is instantiated per slot).

    x arrives UNPADDED: edge tiles zero-fill their out-of-range halo in
    VMEM and shorten the DMA, which removes the (n + 2W) padded-array
    materialization (one full vector read+write per call) from HBM
    traffic.  The separate ``last`` output exists for chained callers
    (power iterations, the s-step drivers): feeding ``V[s-1]`` back as
    the next x forces XLA to materialize a strided row copy, while
    ``last`` is already a dense (n,) array.

    ``W`` overrides the halo depth dflat was padded with (dia_flat_padded
    called with a larger-than-minimal W, e.g. a distributed shard whose
    flat layout was built once for s_max); it must still satisfy
    W >= s*max|offset| and be a multiple of 1024.
    """
    n = x.shape[0]
    out_dt = x.dtype
    if not interpret and jnp.dtype(x.dtype).itemsize == 8:
        # Kernel seam (see _dia_power_step): Mosaic is f32-only; f64
        # driver state (the natural-path dist history dtype under x64)
        # casts here only, outputs return at the caller's dtype.
        x = x.astype(jnp.float32)
        coefs = coefs.astype(jnp.float32)
        dflat = dflat.astype(jnp.float32)
    nd = len(offsets)
    wmax = max(max(abs(o) for o in offsets), 1)
    if W is None:
        W = ((s * wmax + 1023) // 1024) * 1024
    assert W >= s * wmax and W % 1024 == 0, f"invalid fused halo W={W}"
    T = min(tile, n)
    assert n % T == 0, f"n={n} must be a multiple of the tile {T}"
    assert dflat.shape[0] == nd * (n + 2 * W), "dflat built with a different W"
    L = T + 2 * W
    NP = n + 2 * W
    num_tiles = n // T

    def kernel(coef_ref, dflat_ref, x_ref, out_ref, last_ref, d0, x0, d1, x1, sems):
        i = pl.program_id(0)
        num = pl.num_programs(0)
        slot = i % 2
        nxt = (i + 1) % 2

        def xfer(dscr, xscr, sl, tile_idx, go):
            """Issue (go=True) or await the slot's copies; the x-window
            DMA is shortened at the edges and the uncovered halo is
            zero-filled in VMEM at issue time (disjoint regions, so the
            fill and the in-flight DMA cannot race)."""
            for d in range(nd):
                cp = pltpu.make_async_copy(
                    dflat_ref.at[pl.ds(d * NP + tile_idx * T, L)],
                    dscr.at[pl.ds(d * L, L)],
                    sems.at[sl, d],
                )
                cp.start() if go else cp.wait()

            i32 = jnp.int32  # bare Python ints trace as i64 under
            # jax_enable_x64, and Mosaic's convert-element-type lowering
            # recurses without bound on those index converts.
            if num_tiles == 1:
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(i32(0), T)], xscr.at[pl.ds(i32(W), T)],
                    sems.at[sl, nd],
                )
                if go:
                    # Store offsets stay bare Python ints: a traced start
                    # makes the swap's transform dynamic, which Mosaic's
                    # masked-swap lowering rejects ("Too many leaves").
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
                # Offset written as (..)*1024 so Mosaic can prove the
                # 1024-tile alignment syntactically (i*T - W defeats its
                # divisibility prover even though both are multiples).
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
            xcur = xscr[:]
            prev = jnp.zeros_like(xcur)

            for j in range(s):
                # One pad per step (not per diagonal): all nd shifted
                # reads are static slices of the same padded vector.
                vp = jnp.pad(xcur, (wmax, wmax))
                # Balanced tree sum: a linear accumulate chains nd serial
                # FMA latencies per vector register; pairing halves the
                # dependency depth to log2(nd).
                terms = [
                    dscr[pl.ds(d * L, L)]
                    * jax.lax.slice_in_dim(vp, wmax + off, wmax + off + L, axis=0)
                    for d, off in enumerate(offsets)
                ]
                while len(terms) > 1:
                    terms = [
                        terms[t] + terms[t + 1] if t + 1 < len(terms) else terms[t]
                        for t in range(0, len(terms), 2)
                    ]
                acc = terms[0]
                if with_coefs:
                    # Newton three-term corrections; the monomial path
                    # (coefs == 0) compiles them out entirely.
                    w_new = acc - coef_ref[j, 0] * xcur - coef_ref[j, 1] * prev
                    prev = xcur
                else:
                    w_new = acc
                out_ref[j, :] = w_new[W : W + T]
                xcur = w_new
            last_ref[:] = xcur[W : W + T]

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
        V, last = pl.pallas_call(
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
        # vma propagation keeps the kernel usable inside shard_map bodies
        # (jax>=0.9 check_vma requires out_shape vma there).
        out_shape=[
            jax.ShapeDtypeStruct((s, n), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((n,), x.dtype, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((nd * L,), x.dtype),
            pltpu.VMEM((L,), x.dtype),
            pltpu.VMEM((nd * L,), x.dtype),
            pltpu.VMEM((L,), x.dtype),
            pltpu.SemaphoreType.DMA((2, nd + 1)),
        ],
        interpret=interpret,
    )(coefs, dflat, x)
    return V.astype(out_dt), last.astype(out_dt)


def matrix_powers_dia_fused(
    A: DiaMatrix,
    q: jax.Array,
    s: int,
    diag=None,
    sub=None,
    tile: int = 65536,
    interpret: bool = False,
    dflat: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused-s matrix powers: (n, s+1) like matrix_powers_monomial.

    Pass a precomputed ``dflat`` (dia_flat_padded) to amortize the layout
    copy across calls; otherwise it is built here (XLA hoists it out of
    enclosing loops).  Falls back to the per-step kernel when n has no
    aligned tile or the tile halo would not fit.
    """
    n = q.shape[0]
    nd = A.data.shape[0]
    wmax = max(max(abs(o) for o in A.offsets), 1)
    W = ((s * wmax + 1023) // 1024) * 1024
    t = fused_tile(n, nd, W, s, q.dtype, tile)
    if t == 0:
        return matrix_powers_dia_pallas(A, q, s, diag, sub, tile=tile, interpret=interpret)
    coefs = np.zeros((s, 2))
    if diag is not None:
        coefs[:, 0] = np.asarray(diag, np.float64)[:s]
    if sub is not None:
        coefs[:, 1] = np.asarray(sub, np.float64)[:s]
    coefs_j = jnp.asarray(coefs, q.dtype)
    if dflat is None:
        dflat = dia_flat_padded(A, W)
    V, _ = _dia_powers_fused(
        dflat, q, coefs_j, A.offsets, s, tile=t, interpret=interpret,
        with_coefs=bool(np.any(coefs)),
    )
    return jnp.concatenate([q[:, None], V.T], axis=1)
