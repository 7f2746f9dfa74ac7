"""P=1-mesh hardware bench: dist_pell_matrix_powers (PELL local kernel
inside shard_map) vs the single-chip PELL number (~32 Gnnz/s on the same
27-point Laplacian).  Two-point timing protocol (see bench.py)."""
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
import scipy.sparse as sp
from jax import lax

from ca_lanczos_tpu.ops.spmv import EllMatrix
from ca_lanczos_tpu.parallel.dist_pell import DistPell, dist_pell_matrix_powers
from ca_lanczos_tpu.parallel.mesh import make_mesh


def laplacian_3d_27pt(m):
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (m, m))
    return (sp.kron(sp.kron(d1, d1), d1) * (1.0 / 27.0)).tocsr()


def main():
    m, s = 64, 4
    a = laplacian_3d_27pt(m).astype(np.float32)
    n = a.shape[0]
    print(f"n={n}, nnz={a.nnz}, s={s}", flush=True)
    Aell = EllMatrix.from_scipy(a)

    mesh = make_mesh(1)
    t0 = time.perf_counter()
    Ad = DistPell.from_ell(Aell, mesh, s_max=s)
    print(
        f"encode {time.perf_counter()-t0:.1f}s  window m={Ad.m} halo={Ad.halo} "
        f"K={Ad.k_slots} sw={Ad.sw} W={Ad.n_win} interpret={Ad.interpret}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    x = np.asarray(rng.standard_normal(n), np.float32)
    x /= np.linalg.norm(x)
    xs = Ad.shard_vector(x, mesh)
    z = jnp.zeros(s, jnp.float32)

    # Correctness on hardware vs scipy monomial powers
    V = np.asarray(dist_pell_matrix_powers(Ad, xs, s, z, z, mesh))[:n]
    v_ref = x.copy()
    for k in range(1, s + 1):
        v_ref = a @ v_ref
        err = np.max(np.abs(V[:, k] - v_ref)) / np.max(np.abs(v_ref))
        print(f"  power {k}: rel err {err:.2e}", flush=True)

    @partial(jax.jit, static_argnames=("reps",))
    def chain(v, reps):
        def body(i, v):
            W = dist_pell_matrix_powers(Ad, v, s, z, z, mesh)
            return W[:, s]

        return jnp.sum(lax.fori_loop(0, reps, body, v))

    lo, hi = 5, 45
    float(chain(xs, lo)); float(chain(xs, hi))

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(xs, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi)
    rate = a.nnz * s * (hi - lo) / (t_hi - t_lo) / 1e9
    # The kernel also runs the halo rows — report the raw window rate too.
    win_rate = rate * Ad.m / Ad.n_local
    print(
        f"dist P=1 PELL matrix-powers: {rate:.2f} Gnnz/s/chip "
        f"(window-row rate {win_rate:.2f})",
        flush=True,
    )


main()
