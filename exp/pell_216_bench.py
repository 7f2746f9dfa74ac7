"""216^3-scale 27-point Laplacian through the PELL encodings on hardware
(round-5 VERDICT item 5 "Done" condition): 10.08M rows / 272M nnz,
multi-window tiles (z-plane clusters 364 chunks apart, sw=16K windows).
Round 4 measured encoding="auto" falling back to unit here (-35%);
grouped4 must recover the grouped rate.

Usage: python -u exp/pell_216_bench.py [g] -> results/pell_216_bench.jsonl
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from exp.pell_grouped_bench import bench  # noqa: E402  (jax config inside)

T00 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T00:7.1f}s] {msg}", flush=True)


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (g, g))
    t0 = time.perf_counter()
    a = (sp.kron(sp.kron(d1, d1), d1) / 27.0).tocsr().astype(np.float32)
    log(f"built {g}^3 27-pt operator: n={a.shape[0]} nnz={a.nnz} "
        f"({time.perf_counter()-t0:.1f}s)")
    rows = []
    for enc in ("auto", "unit", "grouped", "grouped4"):
        try:
            r = bench(a, enc)
        except Exception as e:
            log(f"{enc}: FAILED ({type(e).__name__}: {e})")
            rows.append(dict(enc_req=enc, failed=str(e)[:200]))
            continue
        log(f"{enc:8s} -> enc={r['enc']} K={r['K']} {r['rate']:.2f} Gnnz/s "
            f"({r['slot_rate']:.1f} Gslot/s) err={r['err']:.1e} "
            f"encode={r['enc_t']:.1f}s")
        rows.append(dict(enc_req=enc, enc=r["enc"], K=r["K"],
                         gnnz_per_s=round(r["rate"], 2),
                         gslot_per_s=round(r["slot_rate"], 1),
                         encode_s=round(r["enc_t"], 1)))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "pell_216_bench.jsonl")
    with open(out, "a") as f:
        for r in rows:
            r.update(n=int(a.shape[0]), nnz=int(a.nnz), g=g,
                     date="2026-08-20")
            f.write(json.dumps(r) + "\n")
    log(f"appended {out}")


main()
