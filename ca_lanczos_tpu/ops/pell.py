"""PELL — pooled-chunk windowed ELL: the general-sparsity TPU kernel format.

The reference declares format generality as the SpMV extension point
(SpMV.m:1-5) and its validation corpus is general SuiteSparse sparsity
(test_restarted_ca_lanczos_all_matrices.m:6-14).  On TPU, XLA's gather
lowering runs at ~0.1 Gnnz/s; Mosaic's only fast gathers are
``dynamic_gather`` *within* a (8, 128) tile, along lanes or sublanes.
PELL is built around exactly that primitive:

* rows live on LANES: each row-group packs 128 consecutive rows; ELL
  slots stack along SUBLANES in groups of 8 (a "slot-tile");
* each column index splits as (chunk, lane) = (col // 128, col % 128);
* UNIT encoding: every sublane of a slot-tile is bound to ONE chunk
  (recorded in a small SMEM table, 8 entries per slot-tile), and holds
  at most one nonzero per row from that chunk.  The whole value gather
  for a slot-tile is then: build an (8, 128) tile C of the 8 chunk rows
  (dynamic sublane reads from the x-span in VMEM) and ONE lane-gather
  ``take_along_axis(C, lidx, axis=1)`` — no chunk-select loop at all.
  Cost: a row's k-th and l-th nonzeros in the SAME chunk must sit in
  different slot-tiles, so the slot count K is sum-of-per-chunk-max
  rather than max-degree (for a 3-D 27-point Laplacian: 40 vs 32 slots,
  +25% HBM traffic for ~2x less gather compute — measured faster).
* per row-tile (T rows), W contiguous x-span WINDOWS (SW elements each,
  1024-aligned) are DMA'd into VMEM (double-buffered across the grid).
  Window starts are chosen per tile by a greedy interval cover of the
  chunks the tile actually touches, so the matrix may have ANY sparsity
  whose per-tile chunk set is coverable by W windows — scattered column
  CLUSTERS (periodic wrap, arrow patterns, block couplings) cost one
  extra window each, not a giant span.  ``cbase`` entries index straight
  into the concatenated window scratch, so the gather inner loop is
  identical for any W; only the DMA prologue scales.

The fused three-term recurrence (Newton shifts, matrix_powers_newton.m:
25-47) rides the same kernel: y = A x - d*x - sb*v_prev.

GROUPED encoding (round 2, ``encoding="grouped"``): the unit encoding's
8 dynamic single-row reads per slot-tile cost ~47% of kernel runtime
(exp/pell_probe2.py).  The grouped variant replaces them with TWO
unaligned (4, 128) dynamic slices per slot-tile ("spread-4 windows")
plus one same-shape sublane gather: each ELEMENT carries a packed int16
(sub<<7 | lane) index, where ``sub`` selects among the tile's 8 fetched
scratch rows (4 from each window) at the element's SOURCE lane and
``lane`` is col % 128 as before.  Constraints: per slot-tile-unit <=1
entry per row, entries sharing a source lane share a chunk, and the
tile's chunk set must be coverable by the two 4-row windows — met by a
cluster-segmented rank layout with conflict bumping (encoder below).
Wins measured on the benchmark patterns: K drops (40->32 Laplacian,
24->16 random banded, 48->24 w16 band, 16->8 ring penta) AND the
mechanism is ~30% cheaper, at 6 B/slot vs 5 (one int16 plane instead of
int8).  ``encoding="auto"`` encodes both ways and keeps the smaller
K*bytes.
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

from ca_lanczos_tpu.ops._mosaic import x64_trace_off

LANES = 128
SLOTS = 8  # slot-tile depth (f32 sublane count)


@register_dataclass
@dataclasses.dataclass(frozen=True)
class PellMatrix:
    """Pooled-chunk windowed ELL operator (see module docstring).

    vals / lidx : (ntiles*K, T) — slot-major, rows-on-lanes layout.
        ``vals[t*K + u, b*128 + r]`` is a nonzero of global row
        t*T + b*128 + r whose chunk is the one bound to unit u of block
        b; ``lidx`` is its lane (col % 128), stored int8 (< 128 by
        construction; 5 B/slot of HBM traffic instead of 8 — measured
        +6% and the convert to i32 happens on the slot-tile in VMEM).
        Zero padding (vals=0, lidx=0) is harmless by construction.
    cbase : (ntiles_pad8, B*K) int32 — per-unit chunk bindings, SCRATCH-
        RELATIVE row indices into the tile's concatenated window scratch
        viewed as (W*SW/128, 128): binding w*SR + (chunk − win_start_w).
        Rides in SMEM BLOCKED in groups of 8 grid steps (Mosaic SMEM
        blocks cannot have sub-8 leading dims, and the whole table would
        bust the 1MB SMEM at ~1M rows), so its row count is padded to a
        multiple of 8.
    span_row : (ntiles, W) int32 — window starts, in 128-element rows of
        the padded x (multiples of 8, i.e. 1024-element alignment);
        unused trailing windows repeat the last real start (their DMA is
        harmless and nothing binds to them).
    """

    vals: jax.Array
    lidx: jax.Array  # unit enc: int8 lanes; grouped enc: int16 (sub<<7|lane)
    cbase: jax.Array  # unit: (tp8, B*K) chunk rows; grouped: (tp8, B*KT*2) bases
    span_row: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    k_slots: int = dataclasses.field(metadata=dict(static=True))
    sw: int = dataclasses.field(metadata=dict(static=True))
    nnz_count: int = dataclasses.field(metadata=dict(static=True))
    n_win: int = dataclasses.field(default=1, metadata=dict(static=True))
    enc: str = dataclasses.field(default="unit", metadata=dict(static=True))

    @property
    def ntiles(self) -> int:
        return self.span_row.shape[0]

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
        T, K = self.tile, self.k_slots
        B = T // LANES
        vals = np.asarray(self.vals).reshape(self.ntiles, K, T)
        lidx = np.asarray(self.lidx).reshape(self.ntiles, K, T)
        span = np.asarray(self.span_row).reshape(self.ntiles, self.n_win)
        sr = self.sw // LANES
        out = np.zeros((self.n, self.n), vals.dtype)
        if self.enc in GROUPED_GEOM:
            nw, sp = GROUPED_GEOM[self.enc]
            KT = K // SLOTS
            cb2 = np.asarray(self.cbase)[: self.ntiles].reshape(
                self.ntiles, B, KT, nw
            )
            for t in range(self.ntiles):
                for s in range(K):
                    for c in range(T):
                        v = vals[t, s, c]
                        if v == 0.0:
                            continue
                        b, r = divmod(c, LANES)
                        lane = int(lidx[t, s, c]) & 127
                        sub = (int(lidx[t, s, b * LANES + lane]) >> 7) & 7
                        scr = cb2[t, b, s // SLOTS][sub // sp] + sub % sp
                        w, rel = divmod(int(scr), sr)
                        chunk = span[t, w] + rel
                        row = t * T + c
                        col = chunk * LANES + lane
                        if row < self.n and col < self.n:
                            out[row, col] += v
            return out
        cbase = np.asarray(self.cbase)[: self.ntiles].reshape(self.ntiles, B, K)
        for t in range(self.ntiles):
            for u in range(K):
                for c in range(T):
                    v = vals[t, u, c]
                    if v == 0.0:
                        continue
                    b, r = divmod(c, LANES)
                    row = t * T + c
                    w, rel = divmod(cbase[t, b, u], sr)
                    chunk = span[t, w] + rel
                    col = chunk * LANES + lidx[t, u, c]
                    if row < self.n and col < self.n:
                        out[row, col] += v
        return out

    @staticmethod
    def from_scipy(
        a,
        tile: int = 1024,
        cmax: Optional[int] = None,  # accepted for API compat; unused
        sw: Optional[int] = None,
        max_windows: int = 16,
        device: bool = True,  # False: keep planes as numpy (host-only use)
        encoding: str = "unit",
        native: object = "auto",
    ) -> "PellMatrix":
        """Encode a scipy.sparse matrix (vectorized, O(nnz log nnz)).

        sw: x-span WINDOW width in elements (multiple of 1024); default =
        smallest width covering every tile's column spread in ONE window
        when that fits in ``SW_MAX`` (64K), else ``SW_MULTI`` (16K) with as
        many windows per tile as the greedy chunk cover needs.  Scattered
        column clusters (periodic wrap, arrow patterns) therefore encode
        without RCM; only sparsity needing more than ``max_windows``
        windows of sw (i.e. > max_windows*sw bytes of x per tile resident
        in VMEM) is rejected.
        cmax is ignored: the unit encoding always carries 8 chunk bindings
        per slot-tile.
        encoding: "unit", "grouped" (two spread-4 windows), "grouped4"
        (four spread-2 windows — multi-cluster tiles, GROUPED_GEOM), or
        "auto" (plan all, keep the lowest HBM traffic per SpMV — grouped
        moves 6 B/slot vs unit's 5, but usually needs fewer slots AND
        runs a cheaper inner loop; grouped4 pays ~15% extra mechanism
        and wins when 2-window packing inflates K, see module
        docstring).
        native: "auto" (use the C++ encoder when its library loads —
        ~40x the numpy path, OpenMP block-parallel; see
        native/pell_encode.cpp), True (require it), or False (numpy).
        Both paths emit identical plane LAYOUTS; slot assignments may
        differ (both valid — matvec-parity-tested).
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

        # Pass 1: per-tile greedy window cover of the touched chunks.
        SW_MAX, SW_MULTI = 65536, 16384
        need = 0
        for t in range(ntiles):
            lo_r, hi_r = t * tile, min((t + 1) * tile, n)
            seg = indices[indptr[lo_r] : indptr[hi_r]]
            cmin = int(seg.min()) if seg.size else lo_r
            cmax_col = int(seg.max()) if seg.size else lo_r
            need = max(need, cmax_col + 1 - ((cmin // 1024) * 1024))
        need = ((need + 1023) // 1024) * 1024

        tile_chunks = []
        for t in range(ntiles):
            lo_r, hi_r = t * tile, min((t + 1) * tile, n)
            seg = indices[indptr[lo_r] : indptr[hi_r]]
            tile_chunks.append(
                np.unique(seg // LANES).astype(np.int64) if seg.size
                else np.asarray([lo_r // LANES], np.int64)
            )

        def _greedy_count(chunks, srq):
            """Windows of srq chunks (1024-aligned starts) a tile needs."""
            i = cnt = 0
            while i < len(chunks):
                start = (int(chunks[i]) // 8) * 8
                cnt += 1
                i = int(np.searchsorted(chunks, start + srq, side="left"))
            return cnt

        if sw is None:
            if need <= SW_MAX:
                sw = need
            else:
                # Multi-window regime: choose the window width that
                # MINIMIZES the total span-DMA fetch (sum over tiles of
                # windows x sw) subject to max_windows.  The old fixed
                # SW_MULTI=16K width over-fetched ~8x on 216^3-scale
                # cluster sparsity (three ~1.5K-column clusters per
                # tile), making the span stream ~40% of kernel traffic
                # (round-5; see BENCHMARKS.md).
                best = None
                for cand in (1024, 2048, 4096, 8192, SW_MULTI, 32768):
                    srq = cand // LANES
                    tot = mx = 0
                    for ch in tile_chunks:
                        c = _greedy_count(ch, srq)
                        tot += c
                        mx = max(mx, c)
                        if mx > max_windows:
                            break
                    if mx > max_windows:
                        continue
                    # Each window costs its fetch plus a fixed DMA-start
                    # charge (~2K elements) so the optimizer doesn't
                    # fragment into many tiny windows for a marginal
                    # fetch saving.
                    cost = tot * (cand + 2048)
                    if best is None or cost < best[0]:
                        best = (cost, cand)
                sw = best[1] if best else SW_MULTI
        sw = max(((sw + 1023) // 1024) * 1024, 1024)
        sw = min(sw, max(((n_pad + 1023) // 1024) * 1024, 1024))
        sr = sw // LANES  # window width in 128-element rows (multiple of 8)
        g_x = max(g_tot, sr)
        win_lists = []
        for t in range(ntiles):
            chunks = tile_chunks[t]
            wins = []
            i = 0
            while i < len(chunks):
                start = (int(chunks[i]) // 8) * 8  # 1024-element alignment
                start = min(start, g_x - sr)  # keep the DMA inside the buffer
                wins.append(start)
                i = int(np.searchsorted(chunks, start + sr, side="left"))
            if len(wins) > max_windows:
                raise ValueError(
                    f"PELL window overflow: row tile {t} needs {len(wins)}"
                    f" windows of {sw} columns (> max_windows={max_windows});"
                    " RCM-reorder the matrix, raise sw, or raise max_windows"
                )
            win_lists.append(np.asarray(wins, np.int64))
        W = max(len(w) for w in win_lists)
        span_rows = np.zeros((ntiles, W), np.int64)
        for t, wins in enumerate(win_lists):
            span_rows[t, : len(wins)] = wins
            span_rows[t, len(wins) :] = wins[-1]  # harmless repeat DMA

        def _finish(vals, lidx, cbase, K, enc):
            put = jnp.asarray if device else np.asarray
            M = PellMatrix(
                vals=put(vals),
                lidx=put(lidx),
                cbase=put(cbase),
                span_row=put(span_rows.astype(np.int32)),
                n=n,
                tile=tile,
                k_slots=K,
                sw=sw,
                nnz_count=int(csr.nnz),
                n_win=W,
                enc=enc,
            )
            # Host copies for consumers that repack the planes
            # (DistPell): fetching device arrays back through the axon
            # relay is minutes-slow, so keep the numpy originals (plain
            # attribute, not a pytree leaf).
            object.__setattr__(
                M, "host_planes", (vals, lidx, cbase, span_rows.astype(np.int32))
            )
            return M

        # Native (C++) encoder: block-parallel O(nnz) planning, plane
        # scatter for the winning encoding only.
        from ca_lanczos_tpu.ops import _pell_native as _pn

        if native is True and not _pn.available():
            # Explicit native=True with no loadable library would crash
            # deep inside plan_unit with lib=None (ADVICE r4) — fail at
            # the API boundary with the actionable message instead.
            raise RuntimeError(
                "native PELL encoder requested (native=True) but "
                "native/libpell could not be built or loaded — check "
                "g++/OpenMP availability, or pass native='auto' to fall "
                "back to the numpy encoder"
            )
        if encoding not in ("unit", "grouped", "grouped4", "auto"):
            raise ValueError(f"unknown PELL encoding {encoding!r}")
        if int(csr.nnz) and native in (True, "auto") and _pn.available():
            csr_c = _pn._Csr(indptr, indices, data, dtype)
            wins32 = np.ascontiguousarray(span_rows, np.int32)
            wcnt = np.asarray([len(w) for w in win_lists], np.int32)
            ch_u, uord_u, K_u = _pn.plan_unit(csr_c, n, tile, sr, wins32, wcnt)
            plans = {}
            for g in _grouped_tries(encoding):
                nw = GROUPED_GEOM[g][0]
                gp = _pn.plan_grouped(csr_c, n, tile, sr, wins32, wcnt, nw=nw)
                if gp is not None:
                    plans[g] = gp
                if g in plans and _grouped_settles(encoding, g, plans[g][3], K_u):
                    break
            if encoding in GROUPED_GEOM and encoding not in plans:
                raise ValueError(
                    f"{encoding} PELL encoding failed; use encoding='unit'"
                )
            pick = _pick_encoding(encoding, K_u, {g: p[3] for g, p in plans.items()})
            if pick != "unit":
                gp = plans[pick]
                planes = _pn.emit_grouped(
                    csr_c, n, tile, gp[0], gp[1], gp[2], gp[3], dtype,
                    nw=GROUPED_GEOM[pick][0],
                )
                return _finish(*planes, pick)
            planes = _pn.emit_unit(csr_c, n, tile, ch_u, uord_u, K_u, dtype)
            return _finish(*planes, "unit")

        # Pass 2 (vectorized): unit assignment.  A UNIT is a (block,
        # chunk, layer) triple; layer j holds the (j+1)-th nonzero each
        # row has in that chunk, so every unit carries <=1 entry per lane
        # and one chunk binding.  Everything stays int32: this host's
        # int64 accumulate/gather paths are ~100x slower.
        nnz = int(csr.nnz)

        grouped = grouped_enc = None
        if nnz:
            for g in _grouped_tries(encoding):
                cand = _encode_grouped(
                    indptr, indices, data, n, tile, win_lists, sw, dtype,
                    geom=g,
                )
                if cand is not None and (
                    grouped is None or cand[3] < grouped[3]
                ):
                    grouped, grouped_enc = cand, g
                if grouped is not None and encoding != "auto":
                    break
        if encoding in ("grouped", "grouped4") and grouped is None:
            raise ValueError(
                f"{encoding} PELL encoding failed; use encoding='unit'"
            )

        def run_rank(brk, ar):
            """Per-element offset within runs delimited by brk (int32)."""
            ar = ar[: len(brk)]
            first = np.maximum.accumulate(np.where(brk, ar, np.int32(0)))
            return ar - first

        if nnz:
            rowcounts = np.diff(indptr).astype(np.int32)
            r_glob = np.repeat(np.arange(n, dtype=np.int32), rowcounts)
            idx32 = indices.astype(np.int32)
            # Scratch-relative binding: w*SR + (chunk - win_start_w), with
            # w the covering window (last start <= chunk; greedy cover
            # guarantees it reaches).  Tile entries are contiguous in CSR.
            chunk_g = idx32 // np.int32(LANES)
            ch = np.empty(nnz, np.int32)
            for t in range(ntiles):
                e0 = indptr[t * tile]
                e1 = indptr[min((t + 1) * tile, n)]
                wins = win_lists[t]
                cg = chunk_g[e0:e1]
                w = np.searchsorted(wins, cg, side="right") - 1
                ch[e0:e1] = (w * sr + (cg - wins[w])).astype(np.int32)
            ln = idx32 % LANES
            block = r_glob // LANES
            lane = r_glob % LANES

            # layer = occurrence index within each contiguous (row, chunk)
            # run (CSR is row- then col-sorted, so runs are contiguous).
            ar_nnz = np.arange(nnz, dtype=np.int32)
            brk = np.empty(nnz, bool)
            brk[0] = True
            np.not_equal(ch[1:], ch[:-1], out=brk[1:])
            brk[1:] |= r_glob[1:] != r_glob[:-1]
            layer = run_rank(brk, ar_nnz)

            # Sort entries by (block, chunk, layer): one int64 composite
            # argsort (fast here), then int32 gathers of the components.
            s_ch = int(ch.max()) + 1
            s_l = int(layer.max()) + 1
            ukey = (block.astype(np.int64) * s_ch + ch) * s_l + layer
            order = np.argsort(ukey, kind="stable").astype(np.int32)
            block_s, ch_s, layer_s = block[order], ch[order], layer[order]

            # Unit id per sorted entry; units are runs of equal key.
            ubrk = np.empty(nnz, bool)
            ubrk[0] = True
            np.not_equal(ch_s[1:], ch_s[:-1], out=ubrk[1:])
            ubrk[1:] |= (block_s[1:] != block_s[:-1]) | (layer_s[1:] != layer_s[:-1])
            uid_s = np.cumsum(ubrk, dtype=np.int32) - 1  # per sorted entry
            ublock = block_s[ubrk]
            uch = ch_s[ubrk]
            # per-block unit ordinal (units are block-sorted)
            ubrk2 = np.empty(len(ublock), bool)
            ubrk2[0] = True
            np.not_equal(ublock[1:], ublock[:-1], out=ubrk2[1:])
            uord = run_rank(ubrk2, ar_nnz)
            u_max = int(uord.max()) + 1
        else:
            u_max = 1

        K = SLOTS * (-(-u_max // SLOTS))
        pick = _pick_encoding(
            encoding, K, {grouped_enc: grouped[3]} if grouped else {}
        )
        ntiles_pad8 = 8 * (-(-ntiles // 8))
        if pick != "unit":
            vals, lidx, cbase, K = grouped
            enc = grouped_enc
        else:
            enc = "unit"
            vals = np.zeros((ntiles * K, tile), dtype)
            lidx = np.zeros((ntiles * K, tile), np.int8)
            cbase = np.zeros((ntiles_pad8, B * K), np.int32)
            if nnz:
                uord_s = uord[uid_s]  # per sorted entry
                t_s = block_s // B
                b_s = block_s % B
                rix = t_s * np.int32(K) + uord_s
                cix = b_s * np.int32(LANES) + lane[order]
                vals[rix, cix] = data[order]
                lidx[rix, cix] = ln[order]
                cbase[ublock // B, (ublock % B) * np.int32(K) + uord] = uch

        return _finish(vals, lidx, cbase, K, enc)

    @staticmethod
    def from_dense(a: np.ndarray, **kw) -> "PellMatrix":
        import scipy.sparse as sp

        return PellMatrix.from_scipy(sp.csr_matrix(np.asarray(a)), **kw)


# Grouped-window geometries: nw windows of spread sp, nw*sp == 8 (the
# gather source is one (8, 128) tile either way).  "grouped" is the
# original two-spread-4 form; "grouped4" (round-5) covers up to four
# scattered chunk clusters — the 216^3-scale multi-window-tile case
# where three z-plane clusters per slot-tile made the 2-window packing
# inflate K2 past the unit encoding's price (VERDICT r4 item 5).  Any
# 2x4 cover is also a 4x2 cover (split each window), so grouped4 is
# strictly more general; it costs two extra dynamic slices per
# slot-tile, so "auto" prefers the 2-window form at equal K.
GROUPED_GEOM = {"grouped": (2, 4), "grouped4": (4, 2)}


def _cover_windows(chunks, nw: int, sp: int):
    """Greedy fixed-length interval cover: bases of ``nw`` spread-``sp``
    windows covering the chunk set, or None if more would be needed.
    Greedy (next window starts at the first uncovered chunk) is optimal
    for fixed-length covers.  Unused windows repeat the last base."""
    cs = sorted(set(chunks))
    bases = []
    i = 0
    while i < len(cs):
        if len(bases) == nw:
            return None
        b = cs[i]
        bases.append(b)
        while i < len(cs) and cs[i] - b < sp:
            i += 1
    if not bases:
        bases = [0]
    while len(bases) < nw:
        bases.append(bases[-1])
    return bases


def _cover2(chunks) -> bool:
    """True if the sorted chunk iterable fits two 4-row spread windows."""
    return _cover_windows(chunks, 2, 4) is not None


# Measured per-slot cost weights for the auto pricing (relative to the
# unit encoding's slot).  Hardware slot rates (exp/pell_grouped_bench,
# exp/pell_216_bench): grouped processes slots 24-31% faster than unit
# on every >=262k-row pattern (52 vs 68 Gslot/s at 216^3; 50 vs 60 at
# the 262k 27-pt), so the earlier HBM-bytes-only model (6 vs 5 B/slot)
# mispriced it — at 216^3 it picked unit (24.9 Gnnz/s) over grouped
# (37.9, +53%).  grouped4 pays ~4% over grouped for its two extra
# dynamic slices (measured -8%..+1%).
_ENC_SLOT_COST = {"unit": 1.0, "grouped": 0.80, "grouped4": 0.84}


def _grouped_tries(encoding: str):
    """Grouped geometries to attempt for an encoding request, cheapest
    mechanism first."""
    if encoding == "unit":
        return []
    if encoding in GROUPED_GEOM:
        return [encoding]
    return ["grouped", "grouped4"]  # auto


def _grouped_settles(encoding: str, geom: str, K_g: int, K_u: int) -> bool:
    """auto plans EVERY geometry (a 4-window K reduction can beat an
    already-winning 2-window plan; planning costs ~15 s at 10M rows
    next to minutes of solve); explicit requests stop at their own."""
    return encoding != "auto"


def _pick_encoding(encoding: str, K_u: int, grouped_Ks: dict) -> str:
    """Choose among unit and the successfully-planned grouped
    geometries.  Explicit requests win unconditionally; auto minimizes
    K x the measured per-slot cost (_ENC_SLOT_COST)."""
    if encoding in GROUPED_GEOM:
        return encoding  # caller has validated availability
    if encoding == "unit" or not grouped_Ks:
        return "unit"
    best, cost = "unit", _ENC_SLOT_COST["unit"] * K_u
    for g in ("grouped", "grouped4"):
        if g in grouped_Ks:
            c = _ENC_SLOT_COST[g] * grouped_Ks[g]
            if c < cost:
                best, cost = g, c
    return best


def _encode_grouped(indptr, indices, data, n, tile, win_lists, sw, dtype,
                    max_iter=64, max_units=512, geom: str = "grouped"):
    """Grouped (windowed, per-element) PELL encoding.

    geom: "grouped" = two spread-4 windows; "grouped4" = four spread-2
    windows (GROUPED_GEOM).  Returns (vals, idx16, cbase2, K2) or None
    when the constraints do not converge (caller falls back to the unit
    encoding).  See module docstring for the layout; the assignment is:

      1. cluster = per-block run of touched scratch chunks (gap >= 3
         splits), per-(row, cluster) rank, cluster-segmented unit ids;
      2. conflict bumping until every unit has <=1 entry per row and
         one chunk per source lane;
      3. per-block greedy packing of units into slot-tiles of 8 under
         the nw-window cover, recording the per-slot-tile window bases;
      4. plane emission: vals + ONE int16 plane with the lane (low 7
         bits, at the entry's OUT-row position) and the chunk-window
         offset (bits 7-9, at the entry's SOURCE-lane position):
         sub = w*sp + (chunk - base_w).
    """
    nw, sp = GROUPED_GEOM[geom]
    nnz = int(indptr[-1])
    sr = sw // LANES
    ntiles = len(win_lists)
    B = tile // LANES
    nblocks = ntiles * B

    rowcounts = np.diff(indptr).astype(np.int32)
    r_glob = np.repeat(np.arange(n, dtype=np.int32), rowcounts)
    idx32 = indices.astype(np.int32)
    chunk_g = idx32 // np.int32(LANES)
    ch = np.empty(nnz, np.int32)
    for t in range(ntiles):
        e0, e1 = indptr[t * tile], indptr[min((t + 1) * tile, n)]
        wins = win_lists[t]
        cg = chunk_g[e0:e1]
        w = np.searchsorted(wins, cg, side="right") - 1
        ch[e0:e1] = (w * sr + (cg - wins[w])).astype(np.int32)
    lane = idx32 % np.int32(LANES)
    block = r_glob // np.int32(LANES)
    row_l = r_glob % np.int32(LANES)
    ar = np.arange(nnz, dtype=np.int32)

    # -- 1. clusters and per-(row, cluster) ranks ------------------------
    S_ch = int(ch.max()) + 1
    pkey = block.astype(np.int64) * S_ch + ch
    order_p = np.argsort(pkey, kind="stable")
    pk_s = pkey[order_p]
    ubrk = np.empty(nnz, bool)
    ubrk[0] = True
    np.not_equal(pk_s[1:], pk_s[:-1], out=ubrk[1:])
    pb = block[order_p][ubrk]
    pc = ch[order_p][ubrk]
    cbrk = np.empty(len(pb), bool)
    cbrk[0] = True
    cbrk[1:] = (pb[1:] != pb[:-1]) | (pc[1:] - pc[:-1] >= 3)
    cid_of_pair = np.cumsum(cbrk, dtype=np.int32) - 1
    pair_of_sorted = np.cumsum(ubrk, dtype=np.int32) - 1
    cid = np.empty(nnz, np.int32)
    cid[order_p] = cid_of_pair[pair_of_sorted]
    ncl = int(cid_of_pair[-1]) + 1
    cl_block = pb[cbrk].astype(np.int64)

    # CSR order is row-major with ch ascending inside a row, so
    # (row, cid) runs are contiguous.
    brk = np.empty(nnz, bool)
    brk[0] = True
    brk[1:] = (r_glob[1:] != r_glob[:-1]) | (cid[1:] != cid[:-1])
    first = np.maximum.accumulate(np.where(brk, ar, np.int32(0)))
    rank = ar - first

    # -- 2. conflict resolution --------------------------------------------
    # Ranks collide when per-row patterns are not locally-shifted copies
    # (e.g. lattice-boundary rows with missing neighbors).  A few cheap
    # vectorized +1 bumps fix sparse collisions; anything left gets a
    # guaranteed-terminating sequential repair: each conflicted entry
    # walks up to the first rank in its (row-cluster) segment that is
    # free for its (lane -> chunk) binding and row.
    bb = np.empty(ncl, bool)
    bb[0] = True
    bb[1:] = cl_block[1:] != cl_block[:-1]

    def conflicts(rank):
        width = np.zeros(ncl, np.int32)
        np.maximum.at(width, cid, rank + np.int32(1))
        csum = np.cumsum(width, dtype=np.int64)
        base = csum - width
        blk_first = np.maximum.accumulate(np.where(bb, base, 0))
        base_in_blk = (base - blk_first).astype(np.int32)
        unit = base_in_blk[cid] + rank
        S_u = int(unit.max()) + 1
        if S_u > max_units:
            return None, None, S_u
        # A: same (block, unit, source lane) must share the chunk
        kA = (block.astype(np.int64) * S_u + unit) * LANES + lane
        oA = np.argsort(kA, kind="stable")
        kA_s = kA[oA]
        gbrk = np.empty(nnz, bool)
        gbrk[0] = True
        np.not_equal(kA_s[1:], kA_s[:-1], out=gbrk[1:])
        runstart = np.maximum.accumulate(np.where(gbrk, ar, np.int32(0)))
        conf = np.zeros(nnz, bool)
        conf[oA] = ch[oA] != ch[oA][runstart]
        # B: same (block, unit, row) — possible only after bumps
        kB = (block.astype(np.int64) * S_u + unit) * LANES + row_l
        oB = np.argsort(kB, kind="stable")
        kB_s = kB[oB]
        gbrkB = np.empty(nnz, bool)
        gbrkB[0] = True
        np.not_equal(kB_s[1:], kB_s[:-1], out=gbrkB[1:])
        conf[oB] |= ~gbrkB
        return conf, unit, S_u

    conf = None
    for _ in range(4):
        conf, unit, S_u = conflicts(rank)
        if conf is None:
            return None
        if not conf.any():
            break
        rank = rank + conf.astype(np.int32)
    if conf is not None and conf.any():
        # Sequential repair over the conflicted segments only.
        bad_cid = np.unique(cid[conf])
        in_bad = np.isin(cid, bad_cid)
        taken_lane = {}  # (cid, rank, lane) -> chunk
        taken_row = set()  # (cid, rank, row)
        keep = in_bad & ~conf
        for i in np.nonzero(keep)[0]:
            key = (int(cid[i]), int(rank[i]))
            taken_lane[key + (int(lane[i]),)] = int(ch[i])
            taken_row.add(key + (int(row_l[i]),))
        for i in np.nonzero(conf)[0]:
            ci, li, ri, hi_c = int(cid[i]), int(lane[i]), int(row_l[i]), int(ch[i])
            rk = int(rank[i])
            while True:
                kl = (ci, rk, li)
                kr = (ci, rk, ri)
                if kr not in taken_row and taken_lane.get(kl, hi_c) == hi_c:
                    taken_lane[kl] = hi_c
                    taken_row.add(kr)
                    rank[i] = rk
                    break
                rk += 1
                if rk > max_units:
                    return None
        conf, unit, S_u = conflicts(rank)
        if conf is None or conf.any():
            return None

    # -- 3. per-block tile packing under the 2-window cover --------------
    kU = (block.astype(np.int64) * S_u + unit) * S_ch + ch
    oU = np.argsort(kU, kind="stable")
    kU_s = kU[oU]
    tbrk = np.empty(nnz, bool)
    tbrk[0] = True
    np.not_equal(kU_s[1:], kU_s[:-1], out=tbrk[1:])
    tb = block[oU][tbrk]
    tu = unit[oU][tbrk]
    tc = ch[oU][tbrk]
    blk_starts = np.searchsorted(tb, np.arange(nblocks + 1))
    slot_map = np.full((nblocks, S_u), -1, np.int32)
    per_block_bases = []
    K2 = 0
    for bk in range(nblocks):
        lo, hi = blk_starts[bk], blk_starts[bk + 1]
        if lo == hi:
            per_block_bases.append([])
            continue
        units_u = tu[lo:hi]
        chs = tc[lo:hi]
        ub = np.empty(hi - lo, bool)
        ub[0] = True
        ub[1:] = units_u[1:] != units_u[:-1]
        ustarts = np.nonzero(ub)[0]
        uends = np.append(ustarts[1:], hi - lo)
        btiles = []
        cur_units, cur_chunks = [], []
        for k in range(len(ustarts)):
            u = int(units_u[ustarts[k]])
            cset = list(chs[ustarts[k] : uends[k]])
            if (len(cur_units) < SLOTS
                    and _cover_windows(cur_chunks + cset, nw, sp) is not None):
                cur_units.append(u)
                cur_chunks += cset
            else:
                if not cur_units or _cover_windows(cset, nw, sp) is None:
                    # A single unit whose own chunk spread exceeds the
                    # nw-window cover cannot be grouped at all — fall
                    # back to the unit encoding rather than emit an
                    # empty slot-tile.
                    return None
                btiles.append((cur_units, cur_chunks))
                cur_units, cur_chunks = [u], cset
        btiles.append((cur_units, cur_chunks))
        bases = []
        for s_t, (us, cks) in enumerate(btiles):
            bases.append(tuple(_cover_windows(cks, nw, sp)))
            for j, u in enumerate(us):
                slot_map[bk, u] = s_t * SLOTS + j
        per_block_bases.append(bases)
        K2 = max(K2, len(btiles) * SLOTS)
    if K2 == 0:
        return None
    KT2 = K2 // SLOTS

    # -- 4. plane emission -------------------------------------------------
    base_arr = np.zeros((nblocks, KT2, nw), np.int32)
    for bk, bases in enumerate(per_block_bases):
        for kt, bs in enumerate(bases):
            base_arr[bk, kt, :] = bs
    slot_e = slot_map[block, unit]
    assert (slot_e >= 0).all()
    kt_e = slot_e // SLOTS
    b_e = base_arr[block, kt_e, :]          # (nnz, nw)
    off_e = ch[:, None] - b_e               # (nnz, nw)
    valid = (off_e >= 0) & (off_e < sp)
    if not valid.any(axis=1).all():
        return None  # cover bookkeeping failure; fall back
    w_e = np.argmax(valid, axis=1).astype(np.int32)  # first covering window
    sub_e = w_e * np.int32(sp) + off_e[np.arange(nnz), w_e]
    if not ((sub_e >= 0) & (sub_e < 8)).all():
        return None
    t_e = block // B
    bl_e = block % B
    rix = t_e * np.int32(K2) + slot_e
    vals_p = np.zeros((ntiles * K2, tile), dtype)
    idx16 = np.zeros((ntiles * K2, tile), np.int16)
    cix_out = bl_e * np.int32(LANES) + row_l
    cix_src = bl_e * np.int32(LANES) + lane
    vals_p[rix, cix_out] = data
    idx16[rix, cix_out] |= lane.astype(np.int16)
    idx16[rix, cix_src] |= (sub_e.astype(np.int16) << 7)
    ntiles_pad8 = 8 * (-(-ntiles // 8))
    cbase2 = np.zeros((ntiles_pad8, B * KT2 * nw), np.int32)
    for bk, bases in enumerate(per_block_bases):
        t, b_l = divmod(bk, B)
        for kt, bs in enumerate(bases):
            for w in range(nw):
                cbase2[t, (b_l * KT2 + kt) * nw + w] = bs[w]
    return vals_p, idx16, cbase2, K2


def _pell_kernel(
    coef_ref,  # SMEM (2,)
    spanc_ref,  # SMEM (8, W) block — this tile's window starts
    spann_ref,  # SMEM (8, W) block — NEXT tile's (rolled copy; prefetch)
    cbase_ref,  # SMEM (8, B*K) block — 8 grid steps per block
    vals_ref,  # VMEM (K, T)
    lidx_ref,  # VMEM (K, T)
    xblk_ref,  # VMEM (B, 128) own rows of x
    vprev_ref,  # VMEM (B, 128)
    x_ref,  # ANY (Gtot, 128) full padded vector
    out_ref,  # VMEM (B, 128)
    xspan,  # VMEM (2*SR, 128) scratch, two span slots
    sems,  # DMA semaphores (2,)
    *,
    B: int,
    KT: int,
    SR: int,
    NT: int,
    W: int,
):
    g = pl.program_id(0)
    slot = g % 2

    # The span table rides in 8-row SMEM BLOCKS like cbase: an
    # (ntiles, W) whole-array SMEM operand lane-pads to ntiles*128 words
    # and blows the 1 MB SMEM at >= ~2000 tiles (first hit at the 10M-row
    # scale, round-5).  Tile g's starts live in spanc[g % 8]; tile g+1's
    # in spann[g % 8] (the rolled copy), so the double-buffered prefetch
    # never needs a row outside this block.
    def span_dma(sref, w, sl):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(sref[g % 8, w], SR), :],
            xspan.at[pl.ds((sl * W + w) * SR, SR), :],
            sems.at[sl * W + w],
        )

    # Double-buffered span stream: tile g+1's x-span windows ride in
    # while tile g computes (the matrix planes are pipelined by
    # pallas_call itself).
    @pl.when(g == 0)
    def _():
        for w in range(W):
            span_dma(spanc_ref, w, 0).start()

    @pl.when(g + 1 < NT)
    def _():
        for w in range(W):
            span_dma(spann_ref, w, (g + 1) % 2).start()

    for w in range(W):
        span_dma(spanc_ref, w, slot).wait()

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


def _pell_kernel_g2(
    coef_ref,  # SMEM (2,)
    spanc_ref,  # SMEM (8, W) block — this tile's window starts
    spann_ref,  # SMEM (8, W) block — next tile's (rolled; see _pell_kernel)
    cbase_ref,  # SMEM (8, B*KT*NW) block — NW window bases per slot-tile
    vals_ref,  # VMEM (K, T)
    idx_ref,  # VMEM (K, T) int16: sub<<7 | lane (see module docstring)
    xblk_ref,  # VMEM (B, 128)
    vprev_ref,  # VMEM (B, 128)
    x_ref,  # ANY (Gtot, 128)
    out_ref,  # VMEM (B, 128)
    xspan,  # VMEM (2*W*SR + 4, 128) scratch (+4: window slice overrun)
    sems,
    *,
    B: int,
    KT: int,
    SR: int,
    NT: int,
    W: int,
    NW: int = 2,
    SP: int = 4,
):
    """Grouped-encoding inner loop: per slot-tile, NW unaligned
    (SP, 128) dynamic slices (NW*SP == 8) replace the unit kernel's 8
    scattered row reads; a same-shape sublane gather (idx>>7) then a
    lane gather (idx&127) place each element.  exp/pell_probe3.py
    prices the 2-window mechanism; the 4-window form costs two extra
    slices and buys multi-cluster tiles (GROUPED_GEOM)."""
    g = pl.program_id(0)
    slot = g % 2

    def span_dma(sref, w, sl):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(sref[g % 8, w], SR), :],
            xspan.at[pl.ds((sl * W + w) * SR, SR), :],
            sems.at[sl * W + w],
        )

    @pl.when(g == 0)
    def _():
        for w in range(W):
            span_dma(spanc_ref, w, 0).start()

    @pl.when(g + 1 < NT)
    def _():
        for w in range(W):
            span_dma(spann_ref, w, (g + 1) % 2).start()

    for w in range(W):
        span_dma(spanc_ref, w, slot).wait()

    d = coef_ref[0]
    sb = coef_ref[1]
    off = slot * W * SR
    for b in range(B):
        acc = jnp.zeros((SLOTS, LANES), out_ref.dtype)
        for kt in range(KT):
            vals = vals_ref[kt * SLOTS : (kt + 1) * SLOTS,
                            b * LANES : (b + 1) * LANES]
            idx = idx_ref[kt * SLOTS : (kt + 1) * SLOTS,
                          b * LANES : (b + 1) * LANES].astype(jnp.int32)
            base = (b * KT + kt) * NW
            Cg = jnp.concatenate(
                [xspan[pl.ds(off + cbase_ref[g % 8, base + w], SP), :]
                 for w in range(NW)],
                axis=0,
            )
            C = jnp.take_along_axis(Cg, idx >> 7, axis=0)
            acc = acc + vals * jnp.take_along_axis(C, idx & 127, axis=1)
        y = jnp.sum(acc, axis=0)
        out_ref[b, :] = y - d * xblk_ref[b, :] - sb * vprev_ref[b, :]


@partial(jax.jit, static_argnames=("tile", "k_slots", "sw", "n_win", "interpret", "enc"))
def _pell_step(
    vals, lidx, cbase, span_row,
    x2,  # (Gtot, 128)
    vprev2,  # (Gtot, 128)
    coefs,  # (2,)
    tile: int,
    k_slots: int,
    sw: int,
    n_win: int = 1,
    interpret: bool = False,
    enc: str = "unit",
):
    """One PELL recurrence step on 2-D-blocked vectors: returns
    y2 = A x - coefs[0] x - coefs[1] v_prev, shape (Gtot, 128)."""
    ntiles = span_row.shape[0]  # cbase rows are padded to a multiple of 8
    B = tile // LANES
    KT = k_slots // SLOTS
    SR = sw // LANES
    W = n_win
    g_out = ntiles * B
    if not interpret and x2.dtype == jnp.float64 and jax.default_backend() == "tpu":
        # f64 planes are for interpret-mode parity only: Mosaic cannot
        # lower 64-bit kernels (convert recursion).  Encode the operator
        # at f32 for device solves (from_scipy on an f32 matrix).
        raise ValueError(
            "PELL kernel traced at float64 on TPU — encode the operator "
            "with float32 planes (f64 planes are interpret-mode only)"
        )
    if enc in GROUPED_GEOM:
        nw_, sp_ = GROUPED_GEOM[enc]
        kern = partial(_pell_kernel_g2, B=B, KT=KT, SR=SR, NT=ntiles, W=W,
                       NW=nw_, SP=sp_)
        scratch_rows = 2 * W * SR + 4  # window slices may overrun by SP-1
    else:
        kern = partial(_pell_kernel, B=B, KT=KT, SR=SR, NT=ntiles, W=W)
        scratch_rows = 2 * W * SR
    # Span table in 8-row blocks (see _pell_kernel): current rows plus a
    # rolled next-tile copy so the g+1 prefetch stays inside block g//8.
    tp8 = 8 * (-(-ntiles // 8))
    span_c = jnp.pad(span_row, ((0, tp8 - ntiles), (0, 0)))
    span_n = jnp.pad(span_row[1:], ((0, tp8 - ntiles + 1), (0, 0)))
    with x64_trace_off(x2.dtype):
        return pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs
            pl.BlockSpec(  # span, current rows: 8 grid steps per block
                (8, n_win), lambda g: (g // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(  # span, next rows (rolled)
                (8, n_win), lambda g: (g // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(  # cbase: 8 grid steps per SMEM block
                (8, cbase.shape[1]), lambda g: (g // 8, 0), memory_space=pltpu.SMEM
            ),
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
            pltpu.VMEM((scratch_rows, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2 * W,)),
        ],
        interpret=interpret,
    )(coefs, span_c, span_n, cbase, vals, lidx, x2, vprev2, x2)


def pell_apply(
    A: PellMatrix,
    x: jax.Array,
    vprev: Optional[jax.Array] = None,
    d: float = 0.0,
    sb: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """y = A x - d x - sb v_prev on (n,) vectors (zero-padded internally).

    The kernel runs at the PLANES' dtype (kernel-seam cast, like the
    dist-ilv engine): an x64 caller probing an f32-plane operator (e.g.
    normest under jax_enable_x64) must not trace an f64 Pallas kernel —
    Mosaic cannot lower 64-bit converts (observed as a RecursionError in
    _convert_helper).  The result is cast back to x's dtype."""
    n, n_x = A.n, A.n_x
    kdt = A.vals.dtype
    x2 = jnp.pad(x, (0, n_x - n)).reshape(-1, LANES).astype(kdt)
    vp = (
        jnp.zeros_like(x2)
        if vprev is None
        else jnp.pad(vprev, (0, n_x - n)).reshape(-1, LANES).astype(kdt)
    )
    coefs = jnp.asarray([d, sb], kdt)
    y2 = _pell_step(
        A.vals, A.lidx, A.cbase, A.span_row, x2, vp, coefs,
        A.tile, A.k_slots, A.sw, A.n_win, interpret, A.enc,
    )
    return y2.reshape(-1)[:n].astype(x.dtype)


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
    kdt = A.vals.dtype  # kernel-seam dtype; see pell_apply
    diag = np.zeros(s) if diag is None else np.asarray(diag, np.float64)
    sub = np.zeros(s) if sub is None else np.asarray(sub, np.float64)
    x2 = jnp.pad(q, (0, n_x - n)).reshape(-1, LANES).astype(kdt)
    vp = jnp.zeros_like(x2)
    cols = [x2]
    for k in range(s):
        coefs = jnp.asarray([diag[k], sub[k]], kdt)
        y2 = _pell_step(
            A.vals, A.lidx, A.cbase, A.span_row, x2, vp, coefs,
            A.tile, A.k_slots, A.sw, A.n_win, interpret, A.enc,
        )
        y2 = jnp.pad(y2, ((0, g_x - y2.shape[0]), (0, 0)))
        cols.append(y2)
        vp, x2 = x2, y2
    V = jnp.stack([c.reshape(-1) for c in cols], axis=1)
    return V[:n].astype(dt)
