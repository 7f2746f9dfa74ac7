"""P=1 distribution overhead, post-ILV (round-3 VERDICT item 7): the
shard-local step of the distributed design riding the interleaved kernel
vs the bare single-chip ILV kernel (647-659 Gnnz/s, BENCH_r03).

Protocol: two-point chained dist step (the drivers' consumption pattern:
rows-native, no q-concat/transpose at the boundary), same 4.2M x 9
operator as bench.py.
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
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax import lax

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.parallel import make_mesh
from ca_lanczos_tpu.parallel.distributed import DistDia, dist_matrix_powers_rows


def main():
    n = 1 << 22
    offsets = tuple(range(-4, 5))
    rng = np.random.default_rng(0)
    data = np.asarray(rng.standard_normal((9, n)), np.float32) * 0.02
    data[4] += 0.8
    A = DiaMatrix(data=data, offsets=offsets)  # host planes
    s = 8
    nnz = sum(n - abs(k) for k in offsets)
    mesh = make_mesh(1)
    q = np.asarray(rng.standard_normal(n), np.float32)
    q /= np.linalg.norm(q)

    for label, kw in (("roll", dict(fused=True)), ("ilv", dict(ilv=True))):
        Ad = DistDia.from_dia(
            DiaMatrix(data=jnp.asarray(data), offsets=offsets), mesh,
            s_max=s, **kw,
        )
        if label == "ilv" and Ad.ilv_dflat is None:
            print("ilv layout did not build!", flush=True)
            continue
        xs = Ad.shard_vector(q, mesh)

        # Ad must be an ARGUMENT, not a closure capture: captured arrays
        # serialize as constants into the remote-compile request, and the
        # relay rejects big bodies (HTTP 413).
        @partial(jax.jit, static_argnames=("mesh_",))
        def chain(Ad_, x, reps, mesh_):
            def body(i, v):
                W = dist_matrix_powers_rows(Ad_, v, s, jnp.zeros(s, v.dtype),
                                            jnp.zeros(s, v.dtype), mesh_)
                return W[s - 1]
            return jnp.sum(lax.fori_loop(0, reps, body, x))

        chain = partial(chain, mesh_=mesh)
        t0 = time.perf_counter()
        float(chain(Ad, xs, jnp.int32(2)))
        print(f"{label}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)

        # two-point protocol (relay-safe; see utils/profiling.py notes)
        def timed(reps, trials=3):
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                float(chain(Ad, xs, jnp.int32(reps)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        reps_lo, reps_hi = 20, 220
        est = []
        for _ in range(5):
            t_lo, t_hi = timed(reps_lo), timed(reps_hi)
            est.append(nnz * s * (reps_hi - reps_lo) / (t_hi - t_lo) / 1e9)
        est.sort()
        print(f"{label}: {est[len(est)//2]:.1f} Gnnz/s/chip "
              f"(spread {est[0]:.1f}-{est[-1]:.1f})", flush=True)


main()
