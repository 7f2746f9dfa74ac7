"""Interleaved-layout fused s-step DIA kernel (roofline candidate).

The production fused kernel (ops.pallas_spmv._dia_powers_fused) is
VPU-bound at ~57% of peak: each step does ~nd shifted 1-D reads per
element, all but one misaligned (lane-roll + select each).  This variant
stores vectors J-INTERLEAVED — ``x_il[r*nq + q] = x[J*q + r]`` with
``nq = n/J`` — so a stencil offset ``o`` for output row ``r`` reads
source row ``(r+o) mod J`` at q-offset ``(r+o)//J``; with J=8 and
|o|<=4, 72% of the (row, offset) pairs read at carry 0, a fully ALIGNED
contiguous stream, and the rest misalign by ONE element.  Data planes
are pre-permuted tile-major on the host (``ilv_data_tiled``), so the
inner loop is almost entirely aligned mul/add streams.

The permutation is invisible to CA-Lanczos consumers: Gram products,
axpys, and norms are permutation-invariant, so q0 is encoded once
(``ilv_encode``) and Ritz vectors decoded once (``ilv_decode``);
chained powers stay interleaved throughout.

Parity: matches the XLA three-term recurrence to FMA-contraction order
(same 1-2 ulp class as the production kernel), asserted in
tests/test_pallas_ilv.py; hardware step parity 2e-7 vs the XLA path.
Hardware pricing (2026-08-19, long-run protocol, 4.2M rows x 9 diags,
s=8): **648-659 Gnnz/s/chip at Tq=16384** vs 472 for the roll-based
fused kernel — a 37-40% roofline push (~81% of the naive fused-traffic
bound).  Tq=32768 exceeds the 16M scoped-vmem limit; 16384 is the
production tile.  bench.py's headline path rides this kernel.

Reference hot loop: matrix_powers_monomial.m:6-12 /
matrix_powers_newton.m:25-47 (the three-term recurrence with Newton
shifts rides the same kernel; zero coefficients give monomial powers).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_dataclass

from ca_lanczos_tpu.ops._mosaic import x64_trace_off
from ca_lanczos_tpu.ops.spmv import DiaMatrix

J = 8  # row interleave factor (f32 sublane count)
WQ = 1024  # per-row q-halo (Mosaic 1-D alignment unit)
KPAD = 1024  # buffer end rims for cross-row carry reads


def ilv_encode(x: np.ndarray) -> np.ndarray:
    """x (n,) -> interleaved (n,): out[r*nq + q] = x[J*q + r]."""
    n = x.shape[0]
    return np.ascontiguousarray(np.asarray(x).reshape(n // J, J).T).reshape(-1)


def ilv_decode(y: np.ndarray) -> np.ndarray:
    """Inverse of :func:`ilv_encode`."""
    n = y.shape[0]
    return np.ascontiguousarray(np.asarray(y).reshape(J, n // J).T).reshape(-1)


def ilv_data_tiled(A: DiaMatrix, Tq: int) -> np.ndarray:
    """Tile-major interleaved data planes: flat (ntiles*nd*J*Lq,) with
    dataI[i, d, r, q'] = data[d, J*(i*Tq - WQ + q') + r] (zero outside
    [0, nq))."""
    data = np.asarray(A.data)
    nd, n = data.shape
    nq = n // J
    Lq = Tq + 2 * WQ
    ntiles = nq // Tq
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
    coefs: jax.Array,  # (s, 2) [diag_shift, sub_coef] per step
    offsets: Tuple[int, ...],
    s: int,
    Tq: int,
    n: int,
    interpret: bool = False,
    with_coefs: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """s-step matrix powers in the interleaved layout.

    Returns (V_il (s, n), last_il (n,)): row j is step j's vector
    (interleaved), and last_il repeats step s-1 as its own contiguous
    1-D output so chained callers avoid any layout change.

    LAYOUT CLIFF (measured 2026-08-19, 4.2M x 9): the kernel's raw
    output is a 1-D (s*n,) linear buffer.  ``reshape(s, n)`` on it
    forces XLA into a pathological relayout (62 Gnnz/s vs 632 for
    last-only consumers — 10x), and a per-row interleave decode is
    worse still (24).  A ``stack`` of 1-D dynamic slices, by contrast,
    lowers to near-free linear copies (611), so THAT is how the (s, n)
    view is built here — consumers must never reshape the 1-D buffer
    themselves.  Chained powers should consume ``last`` (1-D, zero
    relayout); basis builders take V2 rows / V2.T (the (8, n).T
    transpose costs ~0.85 ms at 4.2M — the same cost the roll-based
    kernel's consumers pay).
    """
    out_dt = x_il.dtype
    if not interpret and jnp.dtype(x_il.dtype).itemsize == 8:
        # Kernel seam (see ops/pallas_spmv.py): Mosaic is f32-only — a
        # 64-bit operand recurses the convert-element-type lowering.
        # Dist callers cast in parallel/step.py body_ilv already; this
        # covers direct single-chip callers under x64.
        x_il = x_il.astype(jnp.float32)
        coefs = coefs.astype(jnp.float32)
        dflat_il = dflat_il.astype(jnp.float32)
    nd = len(offsets)
    nq = n // J
    assert n % (J * Tq) == 0 and nq % 1024 == 0 and Tq % 1024 == 0
    # Halo-validity bound: each recurrence step reads the current buffer
    # at q-offsets up to ceil(|o|/J), so the WQ q-halo loses that many
    # valid elements per step.  Violating this returns silently WRONG
    # later-step vectors (steps whose cumulative carry exceeds WQ read
    # stale halo), so it must be a hard error, not a constructor hint.
    max_carry = max(((abs(o) + J - 1) // J for o in offsets), default=0)
    if s * max_carry > WQ:
        raise ValueError(
            f"ilv halo overflow: s={s} steps with max diagonal offset "
            f"{max(abs(o) for o in offsets)} need s*ceil(|o|/{J}) = "
            f"{s * max_carry} q-halo elements but WQ={WQ}; lower s or use "
            "the roll-based fused kernel (ops.pallas_spmv) for this bandwidth"
        )
    Lq = Tq + 2 * WQ
    LB = KPAD + J * Lq + KPAD  # ping-pong buffer length
    ntiles = nq // Tq
    assert ntiles >= 2, "ilv kernel needs >= 2 tiles"
    DSZ = nd * J * Lq

    # static (row, offset) -> (plane, src_row, carry) read plan
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
            pend = []  # python bookkeeping of un-waited V DMAs

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
        V_flat, last = pl.pallas_call(
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
    # (s, n) via stacked 1-D slices — see LAYOUT CLIFF in the docstring.
    V2 = jnp.stack(
        [lax.dynamic_slice(V_flat, (j * n,), (n,)) for j in range(s)], axis=0
    )
    return V2.astype(out_dt), last.astype(out_dt)


# ---------------------------------------------------------------------------
# Operator carrier: the interleaved layout as a first-class Operator.
# ---------------------------------------------------------------------------

def ilv_encode_jax(x: jax.Array) -> jax.Array:
    """Device-side :func:`ilv_encode` (one transpose, done once per solve)."""
    n = x.shape[0]
    return x.reshape(n // J, J).T.reshape(-1)


def ilv_decode_jax(y: jax.Array) -> jax.Array:
    """Device-side inverse of :func:`ilv_encode_jax`.

    Columns of a 2-D multivector decode independently: use
    ``jax.vmap(ilv_decode_jax, in_axes=1, out_axes=1)`` or decode each
    Ritz vector as it is extracted.
    """
    n = y.shape[0]
    return y.reshape(J, n // J).T.reshape(-1)


def _ilv_interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def pick_tq(n: int, nd: int = 9) -> int:
    """Largest valid interleave tile for n rows and nd diagonals (0 if none).

    Constraints from :func:`dia_powers_ilv`: n % (J*Tq) == 0,
    (n/J) % 1024 == 0, at least two tiles, and the scratch VMEM
    (two data-plane buffers + four ping-pong vector buffers) within the
    scoped-vmem budget — the picker degrades to a smaller tile for
    diagonal-heavy operators instead of failing at compile time with an
    opaque Mosaic error.  16384 is the measured sweet spot at nd=9
    (32768 exceeds the 16 MB scoped-vmem limit)."""
    if n % J or (n // J) % 1024:
        return 0
    nq = n // J
    budget = int(14.5 * 1024 * 1024)  # 16 MiB scoped vmem minus headroom
    for tq in (16384, 8192, 4096, 2048, 1024):
        if nq % tq or nq // tq < 2:
            continue
        lq = tq + 2 * WQ
        scratch = (2 * nd * J * lq + 4 * (2 * KPAD + J * lq)) * 4
        if scratch <= budget:
            return tq
    return 0


@register_dataclass
@dataclasses.dataclass(frozen=True)
class IlvDiaMatrix:
    """A DIA operator in the interleaved row layout: represents P A P^T
    where P is the :func:`ilv_encode` permutation.

    A symmetric permutation preserves the spectrum, so every Lanczos
    driver runs on this operator UNCHANGED — matvecs, matrix powers,
    Gram products, and QR factors all live in the permuted space, and
    only the final Ritz VECTORS need :func:`ilv_decode_jax` (values are
    identical).  The payoff is the interleaved fused powers kernel:
    658.7 vs 472 Gnnz/s for the roll-based layout (BENCHMARKS.md).

    Construct with :meth:`from_dia`; encode start vectors with
    :func:`ilv_encode_jax` (or pass a normal-layout vector through
    ``self.encode``).  Reference seam: SpMV.m:1-9 (the declared
    format-extension point).
    """

    dflat: jax.Array  # tile-major interleaved data planes (ilv_data_tiled)
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    tq: int = dataclasses.field(metadata=dict(static=True))
    # Optional normal-layout companion planes (DiaMatrix.data layout).
    # Multivector consumers (fused_restarted's true-residual verification
    # and Rayleigh-Ritz refine) decode their vectors once and run the
    # one-pass XLA DIA matvec on these instead of streaming the matrix
    # once per column through the 1-D kernel.  None keeps the carrier
    # lean for powers-only callers.
    dia_data: Optional[jax.Array] = None

    @property
    def n(self) -> int:
        return self.n_rows

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_rows)

    @property
    def dtype(self):
        return self.dflat.dtype

    @property
    def nnz(self) -> int:
        return sum(self.n_rows - abs(k) for k in self.offsets)

    @property
    def s_max(self) -> int:
        """Largest s the WQ q-halo supports (see dia_powers_ilv guard)."""
        mc = max(((abs(o) + J - 1) // J for o in self.offsets), default=0)
        return WQ // mc if mc else 10**9

    @property
    def dia(self) -> Optional[DiaMatrix]:
        """Normal-layout companion operator (None if not kept)."""
        if self.dia_data is None:
            return None
        return DiaMatrix(data=self.dia_data, offsets=self.offsets)

    @staticmethod
    def from_dia(A: DiaMatrix, tq: int = 0, keep_dia: bool = True) -> "IlvDiaMatrix":
        """Build the interleaved carrier.  ``A.data`` should be host numpy
        for large operators on the relay backend (device fetch is
        ~160 KB/s); ``keep_dia`` stores the normal-layout planes alongside
        for one-pass multivector matvecs (see ``dia_data``)."""
        n = A.data.shape[1]
        tq = tq or pick_tq(n, A.data.shape[0])
        if tq == 0:
            raise ValueError(
                f"n={n} does not admit an interleaved tiling "
                "(need n % 8192 == 0 with >= 2 tiles); keep the DiaMatrix"
            )
        # s=1 (matvec) halo bound; s-step callers hit the stricter
        # s*ceil(|o|/J) <= WQ check inside dia_powers_ilv.
        wmax = max(abs(o) for o in A.offsets) if A.offsets else 0
        if wmax > J * WQ:
            raise ValueError(f"bandwidth {wmax} exceeds the ilv halo {J * WQ}")
        dflat = jnp.asarray(ilv_data_tiled(A, tq))
        return IlvDiaMatrix(
            dflat=dflat, offsets=A.offsets, n_rows=n, tq=tq,
            dia_data=jnp.asarray(A.data) if keep_dia else None,
        )

    def encode(self, x: jax.Array) -> jax.Array:
        return ilv_encode_jax(x)

    def decode(self, y: jax.Array) -> jax.Array:
        if y.ndim == 2:
            return jax.vmap(ilv_decode_jax, in_axes=1, out_axes=1)(y)
        return ilv_decode_jax(y)

    def matvec(self, x: jax.Array) -> jax.Array:
        """(P A P^T) x for an interleaved-layout x."""
        if jnp.iscomplexobj(x):
            raise TypeError(
                "IlvDiaMatrix is a real-arithmetic TPU carrier; use the "
                "split-real propagators or a DiaMatrix for complex work"
            )
        if x.ndim == 2:
            # 2-D blocks: with the normal-layout companion, decode the
            # block once, run the one-pass XLA DIA matvec, re-encode —
            # one matrix stream for the whole block.  Without it, loop
            # columns (NOT vmap: Mosaic cannot lower a vmapped
            # pallas_call whose operands mix block shapes); column
            # counts are small statics (n_wanted) so the unrolled loop
            # compiles once per width.
            if self.dia_data is not None:
                y = self.dia.matvec(self.decode(x))
                return jnp.stack(
                    [ilv_encode_jax(y[:, j]) for j in range(y.shape[1])], axis=1
                )
            cols = [self.matvec(x[:, j]) for j in range(x.shape[1])]
            return jnp.stack(cols, axis=1)
        coefs = jnp.zeros((1, 2), x.dtype)
        _, last = dia_powers_ilv(
            self.dflat, x, coefs, self.offsets, 1, self.tq, self.n_rows,
            interpret=_ilv_interpret(), with_coefs=False,
        )
        return last

    def powers(self, q: jax.Array, s: int, diag=None, sub=None) -> jax.Array:
        """[q, Aq, ..., A^s q] (interleaved), optionally Newton-shifted:
        V[:,k+1] = A V[:,k] - diag[k] V[:,k] - sub[k] V[:,k-1]."""
        with_coefs = diag is not None
        if with_coefs:
            coefs = jnp.stack(
                [jnp.asarray(diag, q.dtype)[:s],
                 jnp.asarray(sub if sub is not None else np.zeros(s), q.dtype)[:s]],
                axis=1,
            )
        else:
            coefs = jnp.zeros((s, 2), q.dtype)
        V2, _ = dia_powers_ilv(
            self.dflat, q, coefs, self.offsets, s, self.tq, self.n_rows,
            interpret=_ilv_interpret(), with_coefs=with_coefs,
        )
        return jnp.concatenate([q[None, :], V2], axis=0).T
