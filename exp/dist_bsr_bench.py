"""P=1-mesh hardware bench: dist_bsr_matrix_powers (block-tile local
contraction inside shard_map) — the DistBsr throughput row for the
BASELINE configs[4] block-operator scaling config (round-4 VERDICT
item 6).  Two-point timing protocol (see bench.py).

Operator: 1M-row block-tridiagonal with dense 8x8 tiles (the
bcsstk/msc node-block sparsity class), f32.
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

from ca_lanczos_tpu.ops.bsr import BsrMatrix
from ca_lanczos_tpu.parallel.dist_bsr import DistBsr, dist_bsr_matrix_powers
from ca_lanczos_tpu.parallel.mesh import make_mesh


def block_tridiag(nb=131072, bs=8, seed=0):
    """(nb*bs)-row block-tridiagonal BsrMatrix with dense random tiles,
    built directly in BSR planes (no scipy detour at 1M rows)."""
    rng = np.random.default_rng(seed)
    vals = np.zeros((nb, 3, bs, bs), np.float32)
    cols = np.zeros((nb, 3), np.int32)
    D = rng.standard_normal((nb, bs, bs)).astype(np.float32) * 0.1
    vals[:, 0] = D @ np.transpose(D, (0, 2, 1)) + 4 * np.eye(bs, dtype=np.float32)
    C = rng.standard_normal((nb - 1, bs, bs)).astype(np.float32) * 0.2
    vals[:-1, 1] = C
    vals[1:, 2] = np.transpose(C, (0, 2, 1))
    cols[:, 0] = np.arange(nb)
    cols[:, 1] = np.minimum(np.arange(nb) + 1, nb - 1)
    cols[:, 2] = np.maximum(np.arange(nb) - 1, 0)
    return BsrMatrix(vals=jnp.asarray(vals), cols=jnp.asarray(cols))


def main():
    nb, bs, s = 131072, 8, 4
    A = block_tridiag(nb, bs)
    n = nb * bs
    nnz = A.exact_nnz()
    print(f"n={n} block {bs}x{bs} structural nnz={nnz/1e6:.1f}M s={s}", flush=True)

    mesh = make_mesh(1)
    Ad = DistBsr.from_bsr(A, mesh, s_max=s)
    print(f"halo_b={Ad.halo_b} nb_local={Ad.nb_local}", flush=True)

    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal(n), np.float32)
    x /= np.linalg.norm(x)
    xs = Ad.shard_vector(x, mesh)
    z = jnp.zeros(s, jnp.float32)

    # Correctness on hardware vs host block matvec (f64 numpy)
    vals = np.asarray(A.vals, np.float64)
    cols = np.asarray(A.cols)

    def host_mv(v):
        xb = v.reshape(-1, bs)[cols]
        return np.einsum("ikab,ikb->ia", vals, xb).reshape(-1)

    V = np.asarray(dist_bsr_matrix_powers(Ad, xs, s, z, z, mesh))[:n]
    v_ref = x.astype(np.float64)
    for k in range(1, s + 1):
        v_ref = host_mv(v_ref)
        err = np.max(np.abs(V[:, k] - v_ref)) / np.max(np.abs(v_ref))
        print(f"  power {k}: rel err {err:.2e}", flush=True)

    # Ad as an ARGUMENT (a closure would bake its 1 GB planes into the
    # program as constants — the >25-min remote-compile hang).
    @partial(jax.jit, static_argnames=("reps",))
    def chain(Ad, v, reps):
        def body(i, v):
            W = dist_bsr_matrix_powers(Ad, v, s, z, z, mesh)
            return W[:, s]

        return jnp.sum(lax.fori_loop(0, reps, body, v))

    lo, hi = 5, 45
    float(chain(Ad, xs, lo)); float(chain(Ad, xs, hi))

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(Ad, xs, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(lo), timed(hi)
    rate = int(nnz) * s * (hi - lo) / (t_hi - t_lo) / 1e9
    print(f"dist P=1 BSR matrix-powers: {rate:.2f} Gnnz/s/chip", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "dist_bsr_bench.json")
    with open(out, "w") as f:
        json.dump(dict(n=n, block=bs, nnz=int(nnz), s=s,
                       gnnz_per_s_chip=round(rate, 2),
                       date="2026-08-20"), f)
    print(f"wrote {out}", flush=True)


main()
