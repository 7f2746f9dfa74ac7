""">=10M-row BSR flagship (round-5 VERDICT item 8; BASELINE configs[4]
"s-step CA-Lanczos on >=10M-row BSR matrix"):

1. P=1 hardware throughput of dist_bsr_matrix_powers at 10.5M rows
   (1.31M block rows of dense 8x8 tiles, block-tridiagonal — the
   bcsstk/msc node-block sparsity class) with the two-point protocol;
2. the distributed restarted CA-Lanczos driver end-to-end on the same
   operator carrying an exactly-planted top spectrum (tail blocks
   decoupled and diagonal), locked eigenvalues checked against it.

Appends results/bsr_10m_e2e.jsonl.  Usage: python -u exp/bsr_10m_e2e.py
[nb_blocks] (default 1310720 -> 10.49M rows).
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BSR_CPU=1: correctness-only leg on the 8-way VIRTUAL mesh (the XLA:TPU
# remote compiler hangs >25 min on the BSR gather at 10M rows —
# memory/axon-tpu-quirks; the 10M-scale CORRECTNESS contract runs on the
# virtual mesh, the hardware throughput row at the largest compiling
# scale via exp/dist_bsr_bench.py).
CPU = bool(os.environ.get("BSR_CPU"))
if CPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from ca_lanczos_tpu.config import LanczosConfig
from ca_lanczos_tpu.ops.bsr import BsrMatrix
from ca_lanczos_tpu.parallel.dist_bsr import DistBsr, dist_bsr_matrix_powers
from ca_lanczos_tpu.parallel.mesh import make_mesh
from ca_lanczos_tpu.parallel.restarted import dist_restarted_ca_lanczos

T00 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T00:7.1f}s] {msg}", flush=True)


def planted_block_tridiag(nb, bs=8, seed=0):
    """Block-tridiagonal with dense SPD-ish tiles, the last 2 block rows
    decoupled and diagonal so the top spectrum is exactly the planted
    values (same verification idea as dryrun_multichip's diag plant)."""
    rng = np.random.default_rng(seed)
    n = nb * bs
    d = np.linspace(1.0, 10.0, n).astype(np.float32)
    top = np.linspace(20.0, 25.0, 2 * bs).astype(np.float32)
    d[-2 * bs:] = top
    vals = np.zeros((nb, 3, bs, bs), np.float32)
    cols = np.zeros((nb, 3), np.int32)
    D = rng.standard_normal((nb, bs, bs)).astype(np.float32) * 0.05
    diag_blocks = D @ np.transpose(D, (0, 2, 1))
    ii = np.arange(bs)
    diag_blocks[:, ii, ii] = d.reshape(nb, bs)
    diag_blocks[-2:] = 0.0
    diag_blocks[-2:, ii, ii] = d.reshape(nb, bs)[-2:]
    vals[:, 0] = diag_blocks
    C = rng.standard_normal((nb - 1, bs, bs)).astype(np.float32) * 0.1
    C[-3:] = 0.0  # decouple the planted tail
    vals[:-1, 1] = C
    vals[1:, 2] = np.transpose(C, (0, 2, 1))
    cols[:, 0] = np.arange(nb)
    cols[:, 1] = np.minimum(np.arange(nb) + 1, nb - 1)
    cols[:, 2] = np.maximum(np.arange(nb) - 1, 0)
    return BsrMatrix(vals=jnp.asarray(vals), cols=jnp.asarray(cols)), top


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 1310720
    bs, s = 8, 4
    A, top = planted_block_tridiag(nb, bs)
    n = nb * bs
    nnz = A.exact_nnz()
    log(f"operator: n={n} ({n/1e6:.2f}M rows) block {bs}x{bs} "
        f"structural nnz={nnz/1e6:.0f}M")

    mesh = make_mesh(8 if CPU else 1)
    t0 = time.perf_counter()
    Ad = DistBsr.from_bsr(A, mesh, s_max=s)
    log(f"partitioned over {mesh.devices.size} device(s) in "
        f"{time.perf_counter()-t0:.1f}s "
        f"(halo_b={Ad.halo_b} nb_local={Ad.nb_local})")

    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal(n), np.float32)
    x /= np.linalg.norm(x)
    rate = None
    if not CPU:
        xs = Ad.shard_vector(x, mesh)
        z = jnp.zeros(s, jnp.float32)

        # Ad as an ARGUMENT (a closure would bake its 1 GB planes into
        # the program as constants — the >25-min remote-compile hang).
        @partial(jax.jit, static_argnames=("reps",))
        def chain(Ad, v, reps):
            def body(i, v):
                W = dist_bsr_matrix_powers(Ad, v, s, z, z, mesh)
                return W[:, s] / jnp.linalg.norm(W[:, s])

            return jnp.sum(lax.fori_loop(0, reps, body, v))

        lo, hi = 3, 23
        t0 = time.perf_counter()
        float(chain(Ad, xs, lo)); float(chain(Ad, xs, hi))
        log(f"compiled chains in {time.perf_counter()-t0:.1f}s")

        def timed(reps, trials=3):
            return min(
                (lambda t0=time.perf_counter(): (float(chain(Ad, xs, reps)),
                                                 time.perf_counter() - t0)[1])()
                for _ in range(trials)
            )

        t_lo, t_hi = timed(lo), timed(hi)
        rate = int(nnz) * s * (hi - lo) / (t_hi - t_lo) / 1e9
        log(f"dist P=1 BSR matrix-powers @ {n/1e6:.1f}M rows: "
            f"{rate:.2f} Gnnz/s/chip")

    # End-to-end: the distributed restarted driver locks the planted top.
    cfg = LanczosConfig(s=s, n_wanted=3, tol=1e-4, max_restarts=30)
    t0 = time.perf_counter()
    res = dist_restarted_ca_lanczos(A, x, 16, mesh, cfg)
    solve_wall = time.perf_counter() - t0
    got = np.sort(np.asarray(res.eigs, np.float64))[::-1][:3]
    want = np.sort(top.astype(np.float64))[::-1][:3]
    err = float(np.max(np.abs(got - want)) / want[0])
    log(f"dist_restarted: converged={res.converged} "
        f"n_restarts={res.n_restarts} top3 rel err={err:.2e} "
        f"wall={solve_wall:.1f}s")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "bsr_10m_e2e.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(dict(
            experiment="bsr_10m_e2e", n=n, block=bs, nnz=int(nnz), s=s,
            mesh="8-way virtual (cpu)" if CPU else "P=1 hardware",
            gnnz_per_s_chip=None if rate is None else round(rate, 2),
            converged=bool(res.converged),
            n_restarts=int(res.n_restarts),
            eig_rel_err=float(f"{err:.3g}"),
            solve_wall_s=round(solve_wall, 1),
            date="2026-08-20",
        )) + "\n")
    log(f"appended {out}")


if __name__ == "__main__":
    main()
