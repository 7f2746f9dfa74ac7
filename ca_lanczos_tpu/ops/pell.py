"""PELL — pooled-chunk windowed ELL: the general-sparsity TPU kernel format.

The reference declares format generality as the SpMV extension point
(SpMV.m:1-5) and its validation corpus is general SuiteSparse sparsity
(test_restarted_ca_lanczos_all_matrices.m:6-14).  On TPU, XLA's gather
lowering runs at ~0.1 Gnnz/s; Mosaic's only fast gather is
``dynamic_gather`` *within* a (R, 128) tile along lanes.  PELL is built
around exactly that primitive:

* rows live on LANES: each row-group packs 128 consecutive rows; ELL
  slots (col-sorted nnz of a row) stack along SUBLANES in groups of 8
  (a "slot-tile"), so ELL padding is quantized at 8 slots, not 128;
* each column index splits as (chunk, lane) = (col // 128, col % 128);
  a slot-tile may reference at most CMAX distinct chunks, recorded in a
  small SMEM table — the value gather is then CMAX lane-gathers from
  chunk rows broadcast out of VMEM, merged by equality select;
* per row-tile (T rows), one contiguous x-span (SW elements, 1024-
  aligned) is DMA'd into VMEM and chunk rows are read from it by dynamic
  sublane index — so the matrix may have ANY sparsity whose per-tile
  column spread fits SW (post-RCM bandwidth up to ~SW-T; far beyond the
  banded DIA kernel's practical reach).

The fused three-term recurrence (Newton shifts, matrix_powers_newton.m:
25-47) rides the same kernel: y = A x - d*x - sb*v_prev.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_dataclass

LANES = 128
SLOTS = 8  # slot-tile depth (f32 sublane count)


@register_dataclass
@dataclasses.dataclass(frozen=True)
class PellMatrix:
    """Pooled-chunk windowed ELL operator (see module docstring).

    vals / pidx : (ntiles*K, T) — slot-major, rows-on-lanes layout.
        ``vals[t*K + k, b*128 + r]`` is the k-th (col-sorted) nonzero of
        global row t*T + b*128 + r; ``pidx`` packs its lane (col % 128,
        low 8 bits) with the position of its chunk in the slot-tile's
        chunk table (bits 8+) into one int32 plane — 8 B/slot of HBM
        traffic instead of 12 with separate index planes.  Zero padding
        (vals=0, pidx=0) is harmless by construction.
    cbase : (ntiles, B*KT*CMAX) int32 — chunk tables, SPAN-RELATIVE row
        indices into the tile's x-span viewed as (SW/128, 128).  Rides in
        SMEM whole (unblocked) and is indexed by program id: Mosaic SMEM
        blocks cannot have sub-8 leading dims.
    ccnt : (ntiles, B*KT) int32 — used chunk-table entries per slot-tile;
        the kernel's gather loop skips unused entries (the static CMAX
        width is the worst slot-tile, most need fewer).
    span_row : (ntiles,) int32 — span start, in 128-element rows of the
        padded x (multiple of 8, i.e. 1024-element alignment).
    """

    vals: jax.Array
    pidx: jax.Array
    cbase: jax.Array
    ccnt: jax.Array
    span_row: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    k_slots: int = dataclasses.field(metadata=dict(static=True))
    cmax: int = dataclasses.field(metadata=dict(static=True))
    sw: int = dataclasses.field(metadata=dict(static=True))
    nnz_count: int = dataclasses.field(metadata=dict(static=True))

    @property
    def ntiles(self) -> int:
        return self.cbase.shape[0]

    @property
    def n_pad(self) -> int:
        return self.ntiles * self.tile

    @property
    def n_x(self) -> int:
        """x-buffer length: n_pad, extended so the widest span fits."""
        return max(self.n_pad, self.sw)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz(self) -> int:
        return self.nnz_count

    def matvec(self, x: jax.Array) -> jax.Array:
        interpret = jax.default_backend() != "tpu"
        if x.ndim == 1:
            return pell_apply(self, x, interpret=interpret)
        cols = [pell_apply(self, x[:, j], interpret=interpret) for j in range(x.shape[1])]
        return jnp.stack(cols, axis=1)

    def to_dense(self) -> np.ndarray:
        """Dense reconstruction (host, testing only)."""
        T, K, CMAX = self.tile, self.k_slots, self.cmax
        B, KT = T // LANES, K // SLOTS
        vals = np.asarray(self.vals).reshape(self.ntiles, K, T)
        pidx = np.asarray(self.pidx).reshape(self.ntiles, K, T)
        lidx = pidx & 0xFF
        hi = pidx >> 8
        cbase = np.asarray(self.cbase).reshape(self.ntiles, B, KT, CMAX)
        span = np.asarray(self.span_row)
        out = np.zeros((self.n, self.n), vals.dtype)
        for t in range(self.ntiles):
            for k in range(K):
                kt = k // SLOTS
                for c in range(T):
                    v = vals[t, k, c]
                    if v == 0.0:
                        continue
                    b, r = divmod(c, LANES)
                    row = t * T + c
                    chunk = cbase[t, b, kt, hi[t, k, c]] + span[t]
                    col = chunk * LANES + lidx[t, k, c]
                    if row < self.n and col < self.n:
                        out[row, col] += v
        return out

    @staticmethod
    def from_scipy(
        a,
        tile: int = 1024,
        cmax: int = 8,
        sw: Optional[int] = None,
    ) -> "PellMatrix":
        """Encode a scipy.sparse matrix.

        sw: x-span width in elements (multiple of 1024); default = smallest
        width covering every tile's column spread.  Raises ValueError when
        a tile's spread cannot be covered (reorder with utils.reorder.rcm
        first, or raise sw — VMEM allows up to ~64K).
        """
        import scipy.sparse as sp

        csr = sp.csr_matrix(a)
        csr.sort_indices()
        n = csr.shape[0]
        assert tile % LANES == 0
        ntiles = -(-n // tile)
        n_pad = ntiles * tile
        g_tot = n_pad // LANES
        B = tile // LANES

        indptr, indices, data = csr.indptr, csr.indices, csr.data
        dtype = np.float32 if data.dtype != np.float64 else data.dtype

        # Pass 1: per-tile column spread -> span rows and required width.
        span_rows = np.zeros(ntiles, np.int64)
        need = 0
        for t in range(ntiles):
            lo_r, hi_r = t * tile, min((t + 1) * tile, n)
            seg = indices[indptr[lo_r] : indptr[hi_r]]
            cmin = int(seg.min()) if seg.size else lo_r
            cmax_col = int(seg.max()) if seg.size else lo_r
            srow = (cmin // 1024) * 8
            span_rows[t] = srow
            need = max(need, cmax_col + 1 - srow * LANES)
        need = ((need + 1023) // 1024) * 1024
        if sw is None:
            sw = need
        sw = max(((sw + 1023) // 1024) * 1024, 1024)
        sw = min(sw, max(((n_pad + 1023) // 1024) * 1024, 1024))
        if need > sw:
            raise ValueError(
                f"PELL span overflow: a row tile spreads over {need} columns"
                f" > sw={sw}; RCM-reorder the matrix or raise sw"
            )
        # The kernel's x buffer is padded to g_x rows so any span fits.
        sr = sw // LANES
        g_x = max(g_tot, sr)
        span_rows = np.minimum(span_rows, g_x - sr)

        # Pass 2: greedy slot assignment per row-group under the CMAX
        # chunk budget per slot-tile.
        per_tile = []  # (kt_count, vals, lidx, hi, tables) per (t, b)
        kt_max = 1
        used_max = 1  # largest chunk-table actually used: the kernel's
        # select loop is static over the table width, and the gather pass
        # is its cost driver (one lane-gather per table entry), so the
        # stored width shrinks to what the matrix needs.
        for t in range(ntiles):
            srow = span_rows[t]
            groups = []
            for b in range(B):
                rows = []
                for r in range(LANES):
                    gr = t * tile + b * LANES + r
                    if gr < n:
                        sl = slice(indptr[gr], indptr[gr + 1])
                        ch = indices[sl] // LANES - srow
                        ln = indices[sl] % LANES
                        rows.append((np.asarray(ch), np.asarray(ln), data[sl]))
                    else:
                        rows.append((np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0)))
                ptr = [0] * LANES
                total = sum(len(rw[0]) for rw in rows)
                done = 0
                g_vals, g_lidx, g_hi, g_tab, g_cnt = [], [], [], [], []
                while done < total:
                    tabs: list = []
                    tv = np.zeros((SLOTS, LANES), dtype)
                    tl = np.zeros((SLOTS, LANES), np.int32)
                    th = np.zeros((SLOTS, LANES), np.int32)
                    for r in range(LANES):
                        ch, ln, dv = rows[r]
                        count = 0
                        while ptr[r] < len(ch) and count < SLOTS:
                            c = int(ch[ptr[r]])
                            if c in tabs:
                                ci = tabs.index(c)
                            elif len(tabs) < cmax:
                                ci = len(tabs)
                                tabs.append(c)
                            else:
                                break
                            tv[count, r] = dv[ptr[r]]
                            tl[count, r] = ln[ptr[r]]
                            th[count, r] = ci
                            ptr[r] += 1
                            count += 1
                            done += 1
                    g_vals.append(tv)
                    g_lidx.append(tl)
                    g_hi.append(th)
                    used_max = max(used_max, len(tabs))
                    g_cnt.append(len(tabs))
                    tab = np.zeros(cmax, np.int32)
                    tab[: len(tabs)] = tabs
                    g_tab.append(tab)
                groups.append((g_vals, g_lidx, g_hi, g_tab, g_cnt))
                kt_max = max(kt_max, len(g_vals))
            per_tile.append(groups)

        KT = kt_max
        K = KT * SLOTS
        cmax_eff = used_max  # shrink the static select loop to actual use
        vals = np.zeros((ntiles * K, tile), dtype)
        pidx = np.zeros((ntiles * K, tile), np.int32)
        cbase = np.zeros((ntiles, B * KT * cmax_eff), np.int32)
        ccnt = np.zeros((ntiles, B * KT), np.int32)
        for t in range(ntiles):
            for b in range(B):
                g_vals, g_lidx, g_hi, g_tab, g_cnt = per_tile[t][b]
                for kt in range(len(g_vals)):
                    rs = t * K + kt * SLOTS
                    cs = b * LANES
                    vals[rs : rs + SLOTS, cs : cs + LANES] = g_vals[kt]
                    pidx[rs : rs + SLOTS, cs : cs + LANES] = (
                        (g_hi[kt] << 8) | g_lidx[kt]
                    )
                    cbase[t, (b * KT + kt) * cmax_eff : (b * KT + kt + 1) * cmax_eff] = g_tab[kt][:cmax_eff]
                    ccnt[t, b * KT + kt] = g_cnt[kt]

        return PellMatrix(
            vals=jnp.asarray(vals),
            pidx=jnp.asarray(pidx),
            cbase=jnp.asarray(cbase),
            ccnt=jnp.asarray(ccnt),
            span_row=jnp.asarray(span_rows, jnp.int32),
            n=n,
            tile=tile,
            k_slots=K,
            cmax=cmax_eff,
            sw=sw,
            nnz_count=int(csr.nnz),
        )

    @staticmethod
    def from_dense(a: np.ndarray, **kw) -> "PellMatrix":
        import scipy.sparse as sp

        return PellMatrix.from_scipy(sp.csr_matrix(np.asarray(a)), **kw)


def _pell_kernel(
    coef_ref,  # SMEM (2,)
    span_ref,  # SMEM (ntiles,) whole
    cbase_ref,  # SMEM (ntiles, B*KT*CMAX) whole
    ccnt_ref,  # SMEM (ntiles, B*KT) whole
    vals_ref,  # VMEM (K, T)
    pidx_ref,  # VMEM (K, T) packed (hi<<8)|lane
    xblk_ref,  # VMEM (B, 128) own rows of x
    vprev_ref,  # VMEM (B, 128)
    x_ref,  # ANY (Gtot, 128) full padded vector
    out_ref,  # VMEM (B, 128)
    xspan,  # VMEM (2*SR, 128) scratch, two span slots
    sems,  # DMA semaphores (2,)
    *,
    B: int,
    KT: int,
    CMAX: int,
    SR: int,
    NT: int,
):
    g = pl.program_id(0)
    slot = g % 2

    def span_dma(i, sl):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(span_ref[i], SR), :],
            xspan.at[pl.ds(sl * SR, SR), :],
            sems.at[sl],
        )

    # Double-buffered span stream: tile g+1's x-span rides in while tile
    # g computes (the matrix planes are pipelined by pallas_call itself).
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
            vals = vals_ref[kt * SLOTS : (kt + 1) * SLOTS, b * LANES : (b + 1) * LANES]
            pidx = pidx_ref[kt * SLOTS : (kt + 1) * SLOTS, b * LANES : (b + 1) * LANES]
            lidx = pidx & 0xFF
            hi = pidx >> 8
            gathered = jnp.zeros((SLOTS, LANES), out_ref.dtype)
            for c in range(CMAX):
                rel = cbase_ref[g, (b * KT + kt) * CMAX + c]
                row = jnp.broadcast_to(xspan[slot * SR + rel, :], (SLOTS, LANES))
                gc = jnp.take_along_axis(row, lidx, axis=1)
                gathered = gathered + jnp.where(hi == c, gc, 0.0)
            acc = acc + vals * gathered
        y = jnp.sum(acc, axis=0)
        out_ref[b, :] = y - d * xblk_ref[b, :] - sb * vprev_ref[b, :]


@partial(jax.jit, static_argnames=("tile", "k_slots", "cmax", "sw", "interpret"))
def _pell_step(
    vals, pidx, cbase, ccnt, span_row,
    x2,  # (Gtot, 128)
    vprev2,  # (Gtot, 128)
    coefs,  # (2,)
    tile: int,
    k_slots: int,
    cmax: int,
    sw: int,
    interpret: bool = False,
):
    """One PELL recurrence step on 2-D-blocked vectors: returns
    y2 = A x - coefs[0] x - coefs[1] v_prev, shape (Gtot, 128)."""
    ntiles = cbase.shape[0]
    B = tile // LANES
    KT = k_slots // SLOTS
    SR = sw // LANES
    g_out = ntiles * B
    kern = partial(_pell_kernel, B=B, KT=KT, CMAX=cmax, SR=SR, NT=ntiles)
    return pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # span_row, whole
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cbase, whole
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ccnt, whole
            pl.BlockSpec((k_slots, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_slots, tile), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full x stays in HBM
        ],
        out_specs=pl.BlockSpec((B, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (g_out, LANES), x2.dtype, vma=getattr(jax.typeof(x2), "vma", frozenset())
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * SR, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(coefs, span_row, cbase, ccnt, vals, pidx, x2, vprev2, x2)


def pell_apply(
    A: PellMatrix,
    x: jax.Array,
    vprev: Optional[jax.Array] = None,
    d: float = 0.0,
    sb: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """y = A x - d x - sb v_prev on (n,) vectors (zero-padded internally)."""
    n, n_x = A.n, A.n_x
    dt = x.dtype
    x2 = jnp.pad(x, (0, n_x - n)).reshape(-1, LANES)
    vp = (
        jnp.zeros_like(x2)
        if vprev is None
        else jnp.pad(vprev, (0, n_x - n)).reshape(-1, LANES)
    )
    coefs = jnp.asarray([d, sb], dt)
    y2 = _pell_step(
        A.vals.astype(dt), A.pidx, A.cbase, A.ccnt, A.span_row, x2, vp, coefs,
        A.tile, A.k_slots, A.cmax, A.sw, interpret,
    )
    return y2.reshape(-1)[:n]


def matrix_powers_pell(
    A: PellMatrix,
    q: jax.Array,
    s: int,
    diag=None,
    sub=None,
    interpret: bool = False,
) -> jax.Array:
    """[q, P_1(A)q, ..., P_s(A)q] -> (n, s+1), like matrix_powers_monomial.

    One kernel launch per step (the span DMA re-reads x each step, which
    is inherent: step k+1's spans depend on step k's full output).
    """
    n, n_x = A.n, A.n_x
    g_x = n_x // LANES
    dt = q.dtype
    diag = np.zeros(s) if diag is None else np.asarray(diag, np.float64)
    sub = np.zeros(s) if sub is None else np.asarray(sub, np.float64)
    x2 = jnp.pad(q, (0, n_x - n)).reshape(-1, LANES)
    vp = jnp.zeros_like(x2)
    vals = A.vals.astype(dt)
    cols = [x2]
    for k in range(s):
        coefs = jnp.asarray([diag[k], sub[k]], dt)
        y2 = _pell_step(
            vals, A.pidx, A.cbase, A.ccnt, A.span_row, x2, vp, coefs,
            A.tile, A.k_slots, A.cmax, A.sw, interpret,
        )
        y2 = jnp.pad(y2, ((0, g_x - y2.shape[0]), (0, 0)))
        cols.append(y2)
        vp, x2 = x2, y2
    V = jnp.stack([c.reshape(-1) for c in cols], axis=1)
    return V[:n]
