"""Device-side f64 polish feasibility + timing at 11M rows (round-5
VERDICT item 7): the chunk-fused row-major pass (solvers/polish.py
rayleigh_ritz_polish) worked at 4.2M (~100 s incl. compile); this probes
whether the same HBM plan discipline holds at the 11M flagship scale —
the host-numpy fallback there costs ~512 s, ~40% of end-to-end time.

A random orthonormal start block is timing-equivalent to a converged
one (identical program); accuracy vs the f64 oracle is additionally
checked against the known planted spectrum by running enough passes to
converge the top-10 subspace from a warm start near it.

Usage: python -u exp/polish_11m_device.py [n] -> one JSON line +
results/polish_device.jsonl row.
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

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.polish import rayleigh_ritz_polish

T00 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T00:7.1f}s] {msg}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 11010048
    k = 10
    # The flagship operator: tridiagonal with a separated planted top
    # (exp/flagship_10m.py), f64 planes.
    rng = np.random.default_rng(0)
    d = np.linspace(1.0, 90.0, n)
    d[-10:] = np.linspace(95.0, 100.0, 10)
    off = np.full(n, 0.5)
    off[-11:] = 0.0  # decouple the planted block: its eigenvalues exact
    data = np.zeros((3, n))
    # DIA convention (ops/spmv.py): A[i, i+k] = data[row_of_k, i].
    data[0, 1:] = off[:-1]  # offset -1: A[i, i-1] = off[i-1]
    data[1] = d
    data[2] = off           # offset +1: A[i, i+1] = off[i]
    A64 = DiaMatrix(data=jnp.asarray(data), offsets=(-1, 0, 1))
    exact = np.sort(np.linspace(95.0, 100.0, 10))[::-1]

    # Warm start near the planted top: exact eigenvectors of the
    # decoupled tail block + f32-level noise (the situation after the
    # f32 solve: ~1e-4-angle subspace error).
    X = np.zeros((n, k), np.float32)
    X[-10:, :] = np.eye(10, dtype=np.float32)[::-1]
    # ~1e-4 subspace ANGLE (the f32 solve's floor), i.e. a unit-norm
    # random direction scaled 1e-4 per column — not 1e-4 per entry,
    # which at 11M rows would be a 0.33-norm perturbation.
    X += (rng.standard_normal((n, k)) * (1e-4 / np.sqrt(n))).astype(
        np.float32)

    iters, depth = 3, 3
    t0 = time.perf_counter()
    w, resid, _ = rayleigh_ritz_polish(A64, jnp.asarray(X), iters=iters,
                                       depth=depth)
    cold = time.perf_counter() - t0
    err = float(np.max(np.abs(np.sort(w)[::-1] - exact)) / 100.0)
    worst = float(np.max(resid))
    log(f"cold polish (incl compile): {cold:.1f}s rel_err={err:.2e} "
        f"worst_resid={worst:.2e}")

    t0 = time.perf_counter()
    w, resid, _ = rayleigh_ritz_polish(A64, jnp.asarray(X), iters=iters,
                                       depth=depth)
    warm = time.perf_counter() - t0
    err = float(np.max(np.abs(np.sort(w)[::-1] - exact)) / 100.0)
    worst = float(np.max(resid))
    log(f"warm polish: {warm:.1f}s rel_err={err:.2e} worst_resid={worst:.2e}")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "polish_device.jsonl")
    rec = dict(experiment="polish_11m_device", n=n, k=k,
               iters=iters, depth=depth,
               cold_wall_s=round(cold, 1), warm_wall_s=round(warm, 1),
               eig_rel_err=float(f"{err:.3g}"),
               worst_true_resid_abs=float(f"{worst:.3g}"),
               worst_true_resid_rel=float(f"{worst / 100.0:.3g}"),
               date="2026-08-20")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec))


main()
