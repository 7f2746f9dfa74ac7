"""Block-banded BSR as scalar DIA on hardware (round-5 TPU-first
finding, ops/bsr.py to_dia): the 10.49M-row block-tridiagonal operator
from exp/bsr_10m_e2e.py converted to a 31-diagonal scalar DIA, its
distributed matrix-powers timed with the same two-point protocol as the
5.74 Gnnz/s BSR row — the format-choice comparison BENCHMARKS.md's BSR
section cites.

Usage: python -u exp/bsr_dia_bench.py [nb_blocks]
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from ca_lanczos_tpu.parallel.distributed import DistDia, dist_matrix_powers_rows
from ca_lanczos_tpu.parallel.mesh import make_mesh
from exp.bsr_10m_e2e import planted_block_tridiag

T00 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-T00:7.1f}s] {m}", flush=True)


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 1310720
    bs, s = 8, 4
    A, _ = planted_block_tridiag(nb, bs)
    n = nb * bs
    nnz = int(A.exact_nnz())
    log(f"operator: n={n} ({n/1e6:.2f}M rows) nnz={nnz/1e6:.0f}M")

    t0 = time.perf_counter()
    D = A.to_dia()
    conv_s = time.perf_counter() - t0
    log(f"to_dia: {len(D.offsets)} scalar diagonals in {conv_s:.1f}s")

    mesh = make_mesh(1)
    t0 = time.perf_counter()
    Dd = DistDia.from_dia(D, mesh, s_max=s)
    log(f"partitioned in {time.perf_counter()-t0:.1f}s "
        f"(fused={Dd.dflat is not None})")

    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal(n), np.float32)
    x /= np.linalg.norm(x)
    xs = Dd.shard_vector(x, mesh)
    z = jnp.zeros(s, jnp.float32)

    @partial(jax.jit, static_argnames=("reps",))
    def chain(Dd, v, reps):
        def body(i, v):
            W = dist_matrix_powers_rows(Dd, v, s, z, z, mesh)
            return W[s - 1] / jnp.linalg.norm(W[s - 1])

        return jnp.sum(lax.fori_loop(0, reps, body, v))

    lo, hi = 5, 45
    t0 = time.perf_counter()
    float(chain(Dd, xs, lo)); float(chain(Dd, xs, hi))
    log(f"compiled in {time.perf_counter()-t0:.1f}s")

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(Dd, xs, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi)
    rate = nnz * s * (hi - lo) / (t_hi - t_lo) / 1e9
    log(f"block-banded-as-DIA matrix-powers @ {n/1e6:.1f}M rows: "
        f"{rate:.1f} Gnnz/s/chip")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "bsr_10m_e2e.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(dict(
            experiment="bsr_as_dia_bench", n=n, block=bs, nnz=nnz, s=s,
            n_offsets=len(D.offsets), convert_s=round(conv_s, 1),
            gnnz_per_s_chip=round(rate, 2), mesh="P=1 hardware",
            date="2026-08-21",
        )) + "\n")
    log(f"appended {out}")


main()
