"""P=1-mesh hardware bench: dist_matrix_powers (fused local kernel) vs the
single-chip fused kernel number (~375 Gnnz/s).  Two-point timing protocol
(see bench.py / utils/profiling.py)."""
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
from jax.sharding import Mesh

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.parallel.distributed import DistDia, _powers_local
from ca_lanczos_tpu.parallel.mesh import make_mesh


def main():
    n = 1 << 22
    offsets = tuple(range(-4, 5))
    ndiags = len(offsets)
    rng = np.random.default_rng(0)
    data = np.asarray(rng.standard_normal((ndiags, n)), np.float32) * 0.02
    data[ndiags // 2] += 0.8
    A = DiaMatrix(data=jnp.asarray(data), offsets=offsets)
    s = 8
    nnz = A.nnz

    mesh = make_mesh(1)
    Ad = DistDia.from_dia(A, mesh, s_max=s)
    print("fused:", Ad.dflat is not None, "tile:", Ad.fused_tile, "m_pad:", Ad.m_pad)
    q = np.asarray(rng.standard_normal(n), np.float32)
    xs = Ad.shard_vector(q / np.linalg.norm(q), mesh)
    z = jnp.zeros(s, jnp.float32)

    from ca_lanczos_tpu.parallel.distributed import dist_matrix_powers_rows

    @partial(jax.jit, static_argnames=("reps",))
    def chain(x, reps):
        def body(i, v):
            W = dist_matrix_powers_rows(Ad, v, s, z, z, mesh)
            return W[s - 1]

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    lo, hi = 2, 12
    float(chain(xs, lo)); float(chain(xs, hi))

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(xs, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi)
    rate = nnz * s * (hi - lo) / (t_hi - t_lo) / 1e9
    print(f"dist P=1 fused matrix-powers: {rate:.1f} Gnnz/s/chip")


main()


def single_chip_materialized():
    """Single-chip fused powers INCLUDING the (n, s+1) V materialization
    (matrix_powers_dia_fused), same consumer pattern as the dist bench."""
    from ca_lanczos_tpu.ops.pallas_spmv import matrix_powers_dia_fused

    n = 1 << 22
    offsets = tuple(range(-4, 5))
    ndiags = len(offsets)
    rng = np.random.default_rng(0)
    data = np.asarray(rng.standard_normal((ndiags, n)), np.float32) * 0.02
    data[ndiags // 2] += 0.8
    A = DiaMatrix(data=jnp.asarray(data), offsets=offsets)
    s = 8
    nnz = A.nnz
    q = np.asarray(rng.standard_normal(n), np.float32)
    qj = jnp.asarray(q / np.linalg.norm(q))

    @partial(jax.jit, static_argnames=("reps",))
    def chain(x, reps):
        def body(i, v):
            V = matrix_powers_dia_fused(A, v, s)
            return V[:, s]

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    lo, hi = 2, 12
    float(chain(qj, lo)); float(chain(qj, hi))

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(qj, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi)
    rate = nnz * s * (hi - lo) / (t_hi - t_lo) / 1e9
    print(f"single-chip fused + V materialization: {rate:.1f} Gnnz/s/chip")


# single_chip_materialized()
