"""10M-row GENERAL-sparsity end-to-end on hardware (round-4 VERDICT
item 5 "Done" condition): the native C++ encoder makes the 10M-row
corpus scale encodable (~12 s for 270M nnz); this drives the encoded
operator through the production mixed-precision fused eigensolve on the
chip and checks the top Ritz values against a scipy eigsh f64 oracle.

Operator: random banded general sparsity at 10.5M rows (a pattern the
DIA/ILV kernels reject — random columns inside a width-8 band, 4
nnz/row) carrying a separated-top spectrum.  The solve rides the PELL
Pallas kernel inside fused_restarted_ca_lanczos (f32 basis/SpMV, f64
reductions), relay-safe bursts, followed by the f64 polish.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ca_lanczos_tpu.ops.pell import PellMatrix
from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos

T00 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T00:7.1f}s] {msg}", flush=True)


def build_operator(n, bw=8, k=4, seed=0):
    rng = np.random.default_rng(seed)
    d = np.linspace(1.0, 90.0, n)
    d[-10:] = np.linspace(95.0, 100.0, 10)
    rows = np.repeat(np.arange(n), k)
    keys = rng.random((n, 2 * bw + 1))
    pick = np.argsort(keys, axis=1)[:, :k]  # k distinct offsets in [-bw, bw]
    cols = np.arange(n)[:, None] + (pick - bw)
    cols = np.clip(cols, 0, n - 1).ravel()
    vals = (rng.standard_normal(n * k) * 1e-3).ravel()
    off = sp.csr_matrix((vals, (rows, cols)), (n, n))
    a = off + off.T + sp.diags(d)
    a.sum_duplicates()
    return a.tocsr(), d


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10 * (1 << 20) + (1 << 19)
    t0 = time.perf_counter()
    a, d = build_operator(n)
    log(f"operator built: n={n} nnz={a.nnz} ({time.perf_counter()-t0:.1f}s)")

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"pell_10m_oracle_{n}.npz")
    t0 = time.perf_counter()
    if os.path.exists(cache):
        exact = np.load(cache)["exact"]
        log("oracle (cached)")
    else:
        exact = np.sort(spla.eigsh(a, k=10, which="LA",
                                   return_eigenvectors=False))[::-1]
        np.savez(cache, exact=exact)
        log(f"oracle eigsh: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    # f32 planes for the device solve (the f64 csr stays for the oracle
    # and the host polish); f64 PELL planes would trace an f64 Mosaic
    # kernel, which cannot lower on TPU.
    A = PellMatrix.from_scipy(a.astype(np.float32), encoding="auto")
    enc_wall = time.perf_counter() - t0
    log(f"PELL encode (native): {enc_wall:.1f}s  K={A.k_slots} enc={A.enc} "
        f"sw={A.sw} W={A.n_win}")

    # PELL_MP=0: the two-stage pipeline (loose over-locked pure-f32
    # solve + deeper f64 polish; exp/flagship_10m.py).  Measured: solve
    # 698 -> 112 s and accuracy 5.4e-11 -> 3.6e-12, but the polish for
    # GENERAL sparsity is host-bound (~2 min/pass at 84M nnz on this
    # 4-core host), so 8 passes cost 1028 s and end-to-end does not
    # improve — single-stage stays the default here until a device f64
    # general-sparsity apply exists.
    mp = os.environ.get("PELL_MP", "1") != "0"
    kw = dict(n_wanted=10 if mp else 13, s=8,
              tol=1e-6 if mp else 1e-4, mixed_precision=mp,
              cycles_per_call=1)
    t0 = time.perf_counter()
    res = fused_restarted_ca_lanczos(
        A, jnp.ones(n, jnp.float32), 32,
        on_burst=lambda c, k_: log(f"  burst: cycle={c} nconv={k_}"), **kw
    )
    solve_wall = time.perf_counter() - t0
    got = np.sort(res.eigs)[::-1][:10]
    err = np.nanmax(np.abs(got - exact)) / 100.0
    log(f"solve: converged={res.converged} n_restarts={res.n_restarts} "
        f"eig_rel_err={err:.2e} wall={solve_wall:.1f}s (incl compile)")

    X = res.Q_conv[:n]
    res_conv, res_rest = bool(res.converged), int(res.n_restarts)
    del res
    # f64 polish on HOST against the scipy f64 operator (the production
    # path at this scale — solvers/polish.py header documents why the
    # device f64 formulations lose to host numpy through the relay; for
    # general sparsity the host matvec is simply a @ Z).
    from ca_lanczos_tpu.solvers.polish import rayleigh_ritz_polish_host

    t0 = time.perf_counter()
    Xh = np.asarray(X)  # one-time device->host fetch (~12 MB/s relay)
    log(f"fetched locked block ({Xh.nbytes/1e6:.0f} MB) in "
        f"{time.perf_counter()-t0:.1f}s")
    from ca_lanczos_tpu.ops._spmm_native import CsrMatmul

    n_pass = int(os.environ.get("POLISH_ITERS", "3" if mp else "8"))
    w, resid, _ = rayleigh_ritz_polish_host(CsrMatmul(a), Xh,
                                            iters=n_pass, depth=3)
    polish_wall = time.perf_counter() - t0
    norm_A = float(exact[0])  # ||A||_2 to eigsh accuracy
    errp = float(np.max(np.abs(np.sort(w)[::-1][:10] - exact) / norm_A))
    # worst residual over the WANTED top-10 columns only (the polish
    # keeps n_wanted+3 columns in two-stage mode; the discarded overflow
    # directions legitimately carry O(1) residuals)
    worst_abs = float(np.max(resid[:10]))
    log(f"f64 polish: {polish_wall:.1f}s POLISHED eig_rel_err={errp:.2e} "
        f"(pre {err:.2e}) worst resid {worst_abs:.2e} "
        f"(rel {worst_abs / norm_A:.2e})")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "pell_10m_e2e.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(dict(
            experiment="pell_10m_e2e",
            n=n, nnz=int(a.nnz), encode_s=round(enc_wall, 1),
            k_slots=int(A.k_slots), enc=A.enc,
            converged=res_conv, n_restarts=res_rest,
            eig_rel_err=float(f"{errp:.3g}"),
            eig_rel_err_prepolish=float(f"{err:.3g}"),
            worst_true_resid_abs=float(f"{worst_abs:.3g}"),
            worst_true_resid_rel=float(f"{worst_abs / norm_A:.3g}"),
            solve_wall_s=round(solve_wall, 1),
            polish_wall_s=round(polish_wall, 1),
            oracle="scipy eigsh f64",
            date="2026-08-20",
        )) + "\n")
    log(f"appended {out}")


main()
