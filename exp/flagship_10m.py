"""North-star scale on one chip: the BASELINE target calls for restarted
CA-Lanczos (s=8, Newton basis) on a >=10M-row sparse matrix (the >=2-host
leg is unreachable in this environment — BASELINE.md north-star table).
This runs the one-XLA-call mixed-precision flagship on an 11M-row
tridiagonal operator (real off-diagonal structure, so the f32 SpMV
rounding floor applies — unlike a pure diagonal) on the single v5e chip,
in relay-safe bursts (exp/dbg42.py: the relay kills long device calls).

Oracle: scipy eigsh (f64) on the same matrix.  Memory: basis 32 x 11M
f32 ~ 1.4 GB, well inside HBM.

Usage: python -u exp/flagship_10m.py [n] [cycles_per_call] [ilv]
(n defaults to 11,010,048; pass 4194304 for the mid-scale rehearsal;
a third arg "ilv" runs the solve on the IlvDiaMatrix carrier — the
headline interleaved kernel — instead of the roll-based powers path).
"""
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

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos

T00 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T00:7.1f}s] {msg}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10 * (1 << 20) + (1 << 19)
    cpc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    use_ilv = len(sys.argv) > 3 and sys.argv[3] == "ilv"
    d = np.linspace(1.0, 90.0, n)
    d[-10:] = np.linspace(95.0, 100.0, 10)
    rng = np.random.default_rng(0)
    off = (rng.standard_normal(n) * 1e-3).astype(np.float64)

    t0 = time.perf_counter()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"flagship_10m_oracle_{n}.npz")
    if os.path.exists(cache):
        exact = np.load(cache)["exact"]
        log("oracle (cached)")
    else:
        a = sp.diags([off[:-1], d, off[:-1]], [-1, 0, 1], format="csr")
        exact = np.sort(spla.eigsh(a, k=10, which="LA",
                                   return_eigenvectors=False))[::-1]
        np.savez(cache, exact=exact)
        log(f"oracle eigsh on {n} rows: {time.perf_counter()-t0:.1f}s")

    # DIA planes: data[k, i] = A[i, i + offsets[k]] (ops/spmv.py:43-49)
    data = np.zeros((3, n), np.float32)
    data[0, 1:] = off[:-1]   # offset -1: A[i, i-1] = off[i-1]
    data[1] = d              # offset 0
    data[2, :-1] = off[:-1]  # offset +1: A[i, i+1] = off[i]
    if use_ilv:
        from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix, ilv_encode

        A = IlvDiaMatrix.from_dia(DiaMatrix(data=data, offsets=(-1, 0, 1)))
        r = jnp.asarray(ilv_encode(np.ones(n, np.float32)))
    else:
        A = DiaMatrix(data=jnp.asarray(data), offsets=(-1, 0, 1))
        r = jnp.ones(n, jnp.float32)
    log(f"planes on device (ilv={use_ilv})")
    # m=32 basis: the 48-vector config's compile-time plan wants 24.5 GB
    # (> 15.75 HBM); 32 vectors fit and restarts make up the depth.
    # cycles_per_call: the axon relay kills device calls running many
    # minutes (exp/dbg42.py bisection) — the burst driver bounds each
    # call with numerics identical to one-call.
    # tol=1e-6: the lock gate is tol*||A|| on the Ritz ESTIMATE; the f32
    # basis storage floors the achievable estimate near 6e-6*||A|| at
    # this scale (the 4.2M rehearsal sat at nconv=1 for 75 cycles with
    # tol=1e-7 — candidates hovered just above the 1e-5 gate).  Final
    # accuracy is set by the f64-Gram refine pass and REPORTED against
    # the scipy oracle, not assumed from the gate.
    # FLAGSHIP_MP=0: drop the in-solve f64 Gram/R reductions (f64
    # emulation dominates the cycle time at scale) and lean on the f64
    # polish for final accuracy — round-5 experiment.
    mp = os.environ.get("FLAGSHIP_MP", "0") != "0"
    tol = float(os.environ.get("FLAGSHIP_TOL", "1e-4" if not mp else "1e-6"))
    # FLAGSHIP_NW > 10: over-lock so the loose-solve span contains the
    # true top-10 even when some locked directions are sloppy; the f64
    # polish RR keeps the top 10 (two-stage experiment, round 5).
    nw = int(os.environ.get("FLAGSHIP_NW", "13" if not mp else "10"))
    kw = dict(n_wanted=nw, s=8, tol=tol, mixed_precision=mp,
              cycles_per_call=cpc)

    def prog(cycle, nconv):
        log(f"  burst: cycle={cycle} nconv={nconv}")

    t0 = time.perf_counter()
    res = fused_restarted_ca_lanczos(A, r, 32, on_burst=prog, **kw)
    cold = time.perf_counter() - t0
    log(f"cold (incl compile): {cold:.1f}s")
    got = np.sort(res.eigs)[::-1][:10]
    err = np.nanmax(np.abs(got - exact)) / 100.0
    log(
        f"flagship mp n={n} cpc={cpc}: converged={res.converged} "
        f"n_restarts={res.n_restarts} eig_rel_err={err:.2e} "
        f"cold_wall={cold:.1f}s"
    )
    res = None  # free the cold run's device state before the warm rerun
    # (holding both full solve states OOM'd the 15.75 GB HBM at 11M)
    t0 = time.perf_counter()
    res = fused_restarted_ca_lanczos(A, r, 32, **kw)
    wall = time.perf_counter() - t0
    got = np.sort(res.eigs)[::-1][:10]
    err = np.nanmax(np.abs(got - exact)) / 100.0
    log(
        f"warm rerun: converged={res.converged} n_restarts={res.n_restarts} "
        f"eig_rel_err={err:.2e} warm_wall={wall:.1f}s"
    )

    # Final f64 polish (round-4 VERDICT item 3): the solve's accuracy is
    # floored by the f32 REPRESENTATION of A (~6e-8 relative) plus f32
    # basis storage; the block-Krylov Rayleigh-Ritz polish runs against
    # f64 planes as its own device call.  Per-pair true residuals are
    # the instrumentation the 2.3e-5 record lacked.
    from ca_lanczos_tpu.solvers.polish import (
        rayleigh_ritz_polish, rayleigh_ritz_polish_host,
    )

    a64 = sp.diags([off[:-1], d, off[:-1]], [-1, 0, 1], format="csr")
    X = res.Q_conv
    res_converged, res_restarts = bool(res.converged), int(res.n_restarts)
    del res  # free solve-side device buffers before the polish
    if use_ilv:
        from ca_lanczos_tpu.ops.pallas_ilv import ilv_decode_jax

        X = jnp.stack([ilv_decode_jax(X[:, j]) for j in range(X.shape[1])], 1)
    n_pass = int(os.environ.get("POLISH_ITERS", "10" if not mp else "3"))
    n_depth = int(os.environ.get("POLISH_DEPTH", "4"))
    t0 = time.perf_counter()
    if os.environ.get("POLISH_HOST"):
        # Fallback: the round-4 production path (fetch + host numpy).
        Xh = np.asarray(X)  # one-time device->host fetch (~12 MB/s relay)
        log(f"fetched locked block ({Xh.nbytes/1e6:.0f} MB) in "
            f"{time.perf_counter()-t0:.1f}s")
        w, resid, _ = rayleigh_ritz_polish_host(
            lambda Z: a64 @ Z, Xh, iters=n_pass, depth=n_depth)
    else:
        # Round-5 default: DEVICE f64 polish (bytes-budgeted chunked
        # passes fit the 11M scale in HBM now: results/polish_device
        # .jsonl, 24 s warm vs 512 s host+fetch) — no block fetch at all.
        data64 = np.zeros((3, n))
        data64[0, 1:] = off[:-1]  # A[i, i-1]
        data64[1] = d
        data64[2, :-1] = off[:-1]  # A[i, i+1]
        A64 = DiaMatrix(data=jnp.asarray(data64), offsets=(-1, 0, 1))
        w, resid, _ = rayleigh_ritz_polish(
            A64, jnp.asarray(X, jnp.float32), iters=n_pass, depth=n_depth)
    polish_wall = time.perf_counter() - t0
    wp = np.sort(w)[::-1][:10]
    perr = np.abs(wp - exact) / 100.0
    log(f"f64 polish: {polish_wall:.1f}s  per-pair rel err: "
        + " ".join(f"{e:.1e}" for e in perr))
    log(f"  per-pair true residuals: "
        + " ".join(f"{float(x):.1e}" for x in np.sort(resid)[::-1]))
    err_p = float(np.max(perr))
    log(f"POLISHED eig_rel_err={err_p:.2e} (pre-polish {err:.2e})")

    import json

    rec = dict(
        experiment="flagship_10m", n=n, nnz=3 * n - 2,
        offsets=[-1, 0, 1],
        config=dict(n_wanted=nw, s=8, basis="newton", max_lanczos=32,
                    tol=tol, mixed_precision=mp, cycles_per_call=cpc,
                    qr="cholqr2", ilv=use_ilv,
                    polish=f"f64 block-Krylov RR iters={n_pass} "
                           f"depth={n_depth} (device)"),
        converged=res_converged, n_restarts=res_restarts,
        eig_rel_err=float(f"{err_p:.3g}"),
        eig_rel_err_prepolish=float(f"{err:.3g}"),
        worst_true_resid_abs=float(f"{float(np.max(resid)):.3g}"),
        # ||Ax - wx|| / ||A|| — the reference's own convergence metric
        # (restarted_ca_lanczos.m:110-116 scales tol by normest(A));
        # ||A|| = 100 for this planted spectrum (round-5 VERDICT item 6:
        # report the vector floor honestly, values-only was misleading)
        worst_true_resid_rel=float(f"{float(np.max(resid)) / 100.0:.3g}"),
        cold_wall_s=round(cold, 1), warm_wall_s=round(wall, 1),
        polish_wall_s=round(polish_wall, 1),
        per_cycle_s=round(wall / max(res_restarts, 1), 1),
        oracle="scipy eigsh f64",
        note="round-4: f64 polish closes the at-scale accuracy gap",
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "flagship_10m.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(f"appended {out}")


main()
