"""Grouped-PELL encoder prototype (host-only): computes the slot count
K2 the two-spread-4-window per-element encoding needs, vs the current
unit encoding's K, on the benchmark sparsity patterns.  Decision gate
for the kernel rework (ROADMAP item 2): net = (K/K2) * (5/6 traffic) *
(V5/V0 mechanism speedup from exp/pell_probe3.py).

Encoding rules per block (128 rows), entries (r, c=scratch chunk, l=col%128):
  unit u: <=1 entry per row; same source lane => same chunk.
  slot-tile (8 units): chunk set coverable by TWO windows of 4
  consecutive scratch rows.
Units are laid out cluster-segmented: per-block chunk runs (gap >= 2
splits), per-(row, cluster) rank + conflict bumping, segments packed
into tiles with padding where the 2-window cover fails.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

LANES = 128
SLOTS = 8


def encode_block_units(entries):
    """entries: list of (row, chunk, lane, val-slot id).  Returns list of
    units; each unit is dict lane->chunk plus list of entries, grouped by
    cluster segments.  Pure prototype: counts only."""
    # split chunks into clusters (runs with gap < 2)
    chunks = np.unique([c for (_, c, _) in entries])
    clusters = []
    start = prev = chunks[0]
    for c in chunks[1:]:
        if c - prev >= 3:
            clusters.append((start, prev))
            start = c
        prev = c
    clusters.append((start, prev))

    def cluster_of(c):
        for i, (a, b) in enumerate(clusters):
            if a <= c <= b:
                return i
        raise AssertionError

    # per (row, cluster) rank
    by_rc = {}
    for (r, c, l) in entries:
        by_rc.setdefault((r, cluster_of(c)), []).append((c, l))
    seg_units = [[] for _ in clusters]  # per cluster: list of units
    for (r, ci), es in by_rc.items():
        es.sort()
        for rank, (c, l) in enumerate(es):
            units = seg_units[ci]
            u = rank
            # conflict resolution: same source lane must share chunk;
            # one entry per row per unit
            while True:
                while u >= len(units):
                    units.append({"lanes": {}, "rows": set()})
                U = units[u]
                if r in U["rows"] or U["lanes"].get(l, c) != c:
                    u += 1
                    continue
                U["lanes"][l] = c
                U["rows"].add(r)
                U.setdefault("entries", []).append((r, c, l))
                break
    return seg_units, clusters


def tile_pack(seg_units):
    """Pack cluster segments' units into slot-tiles of 8 with the
    2x spread-4 window constraint; returns total unit-slots used
    (multiple of 8 per final padding)."""
    def win_cover(chunkset):
        """Can chunkset be covered by 2 windows of 4 consecutive rows?"""
        cs = sorted(chunkset)
        if not cs:
            return True
        if cs[-1] - cs[0] < 4:
            return True
        # first window anchored at cs[0]
        rest = [c for c in cs if c - cs[0] >= 4]
        return rest[-1] - rest[0] < 4

    tiles = []  # each: list of units (chunk sets)
    cur = []
    cur_chunks = set()
    for units in seg_units:
        for U in units:
            cset = set(U["lanes"].values())
            if len(cur) < 8 and win_cover(cur_chunks | cset):
                cur.append(U)
                cur_chunks |= cset
            else:
                tiles.append(cur)
                cur = [U]
                cur_chunks = set(cset)
    if cur:
        tiles.append(cur)
    return len(tiles) * 8


def k2_of(a, tile=1024):
    """K2 (slots) for the grouped encoding, max over blocks; and the
    current unit-encoding K for comparison (sum of per-chunk max)."""
    csr = sp.csr_matrix(a)
    csr.sort_indices()
    n = csr.shape[0]
    nblocks = -(-n // LANES)
    k2_max = 0
    k1_max = 0
    indptr, indices = csr.indptr, csr.indices
    for b in range(nblocks):
        lo, hi = b * LANES, min((b + 1) * LANES, n)
        entries = []
        per_chunk_counts = {}
        for r in range(lo, hi):
            row_cols = indices[indptr[r]:indptr[r + 1]]
            cc = {}
            for col in row_cols:
                c, l = col // LANES, col % LANES
                entries.append((r - lo, c, l))
                cc[c] = cc.get(c, 0) + 1
            for c, k in cc.items():
                per_chunk_counts[c] = max(per_chunk_counts.get(c, 0), k)
        if not entries:
            continue
        k1 = sum(per_chunk_counts.values())
        seg_units, _ = encode_block_units(entries)
        k2 = tile_pack(seg_units)
        k1_max = max(k1_max, k1)
        k2_max = max(k2_max, k2)
    k1_max = SLOTS * (-(-k1_max // SLOTS))
    return k1_max, k2_max


def lap27(m):
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (m, m))
    return (sp.kron(sp.kron(d1, d1), d1) / 27.0).tocsr()


def random_banded(n, bw, k, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), k)
    lo = np.maximum(0, np.arange(n) - bw)
    hi = np.minimum(n, np.arange(n) + bw + 1)
    keys = rng.random((n, 2 * bw + 1))
    span = hi - lo
    keys[np.arange(2 * bw + 1)[None, :] >= span[:, None]] = 2.0
    cols = (lo[:, None] + np.argsort(keys, axis=1)[:, :k]).ravel()
    B = sp.csr_matrix((np.ones(n * k), (rows, cols)), shape=(n, n))
    return (B + B.T).tocsr()


def ring_penta(n):
    o = np.ones(n)
    A = sp.diags([o, o, 4 * o, o, o], [-2, -1, 0, 1, 2], (n, n)).tolil()
    A[0, n - 1] = A[n - 1, 0] = 1.0
    A[0, n - 2] = A[n - 2, 0] = 1.0
    A[1, n - 1] = A[n - 1, 1] = 1.0
    return A.tocsr()


def arrow_band(n, bw=2):
    o = np.ones(n)
    A = sp.diags([o, 3 * o, o], [-1, 0, 1], (n, n)).tolil()
    A[0, :] = 1.0
    A[:, 0] = 1.0
    return A.tocsr()


def main():
    cases = {
        "lap27_262k": lap27(64),
        "rand_banded_64k": random_banded(1 << 16, 8, 4),
        "band_w16_64k": random_banded(1 << 16, 16, 8, seed=1),
        "ring_penta_256k": ring_penta(1 << 18),
        "arrow_band_256k": arrow_band(1 << 18),
    }
    for name, a in cases.items():
        k1, k2 = k2_of(a)
        nnzr = a.nnz / a.shape[0]
        print(f"{name:18s} nnz/row={nnzr:5.1f}  K_unit={k1:3d}  K_grouped={k2:3d}"
              f"  traffic_ratio={(6*k2)/(5*k1):.2f}", flush=True)


main()
