"""P=1 distribution overhead, post-ILV (round-3 VERDICT item 7): the
shard-local step of the distributed design riding the interleaved kernel
vs the bare single-chip ILV kernel (647-659 Gnnz/s, BENCH_r03).

Two protocols per path:
* per-call: one jitted shard_map per s-step block (what a naive caller
  of dist_matrix_powers_* pays — boundary materialization per block);
* in-body: the whole chain inside ONE shard_map body (what the real
  drivers pay — their block loop lives inside the body).  For ilv the
  in-body chain carries the PADDED interleaved domain: ghosts are
  refreshed by (J, 128) edge ppermutes per block and the kernel output
  chains directly — no center re-assembly (the production dist-ilv
  state design).

Same 4.2M x 9 operator as bench.py.
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

from jax.sharding import PartitionSpec

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.parallel import make_mesh
from ca_lanczos_tpu.parallel.distributed import (
    ILV_HALO_Q, DistDia, _powers_local, dia_powers_statics, dist_ilv_encode,
    dist_matrix_powers_ilv, dist_matrix_powers_rows,
)
from ca_lanczos_tpu.parallel.mesh import ROWS


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
        if label == "ilv":
            xs = dist_ilv_encode(Ad, q, mesh)
        else:
            xs = Ad.shard_vector(q, mesh)

        # Ad must be an ARGUMENT, not a closure capture: captured arrays
        # serialize as constants into the remote-compile request, and the
        # relay rejects big bodies (HTTP 413).
        @partial(jax.jit, static_argnames=("mesh_", "ilv_"))
        def chain(Ad_, x, reps, mesh_, ilv_=False):
            def body(i, v):
                fn = dist_matrix_powers_ilv if ilv_ else dist_matrix_powers_rows
                W = fn(Ad_, v, s, jnp.zeros(s, v.dtype),
                       jnp.zeros(s, v.dtype), mesh_)
                return W[s - 1]
            return jnp.sum(lax.fori_loop(0, reps, body, x))

        chain = partial(chain, ilv_=(label == "ilv"))

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
        print(f"{label} (per-call): {est[len(est)//2]:.1f} Gnnz/s/chip "
              f"(spread {est[0]:.1f}-{est[-1]:.1f})", flush=True)

    # ---- in-body chains: the drivers' pattern (one shard_map) ---------
    for label in ("roll", "ilv"):
        Ad = DistDia.from_dia(
            DiaMatrix(data=jnp.asarray(data), offsets=offsets), mesh,
            s_max=s, **(dict(fused=True) if label == "roll" else dict(ilv=True)),
        )
        P = Ad.n_shards
        z = jnp.zeros(s, jnp.float32)
        if label == "roll":
            xs = Ad.shard_vector(q, mesh)
            st = dia_powers_statics(Ad, s)

            def local(data_block, dflat_block, x, reps):
                def body(i, v):
                    W = _powers_local(
                        data_block[0], v, z, z,
                        dflat_local=dflat_block[0],
                        transposed=True, include_q=False, **st,
                    )
                    return W[s - 1]
                return jnp.sum(lax.fori_loop(0, reps, body, x))[None]

            fn = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(PartitionSpec(ROWS), PartitionSpec(ROWS),
                          PartitionSpec(ROWS), PartitionSpec()),
                out_specs=PartitionSpec(ROWS),
            ), static_argnames=())
            run = lambda reps: float(jnp.sum(fn(
                Ad.data, Ad.dflat, xs, jnp.int32(reps))))
        else:
            # padded-domain state: [ghost | center | ghost | zeros] per
            # plane; ghosts refreshed by edge ppermutes per block, the
            # kernel output chains directly (no center re-assembly).
            from jax.sharding import NamedSharding

            from ca_lanczos_tpu.parallel.distributed import (
                ilv_pad_state, ilv_padded_powers, ilv_statics,
            )

            xp0 = jax.device_put(
                jnp.asarray(ilv_pad_state(
                    Ad, np.asarray(dist_ilv_encode(Ad, q, mesh)))),
                NamedSharding(mesh, PartitionSpec(ROWS)),
            )
            z = jnp.zeros(s, jnp.float32)
            st = ilv_statics(Ad, s)

            def local(iflat_block, xp_in, reps):
                iflat = iflat_block[0]

                def body(i, xp):
                    _, last_v = ilv_padded_powers(iflat, xp, z, z, **st)
                    return last_v

                return jnp.sum(lax.fori_loop(0, reps, body, xp_in))[None]

            fn = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(PartitionSpec(ROWS), PartitionSpec(ROWS),
                          PartitionSpec()),
                out_specs=PartitionSpec(ROWS),
            ))
            run = lambda reps: float(jnp.sum(fn(
                Ad.ilv_dflat, xp0, jnp.int32(reps))))

        t0 = time.perf_counter()
        run(2)
        print(f"{label} (in-body): compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)

        def timed2(reps, trials=3):
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                run(reps)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        est = []
        for _ in range(5):
            t_lo, t_hi = timed2(20), timed2(220)
            est.append(nnz * s * 200 / (t_hi - t_lo) / 1e9)
        est.sort()
        print(f"{label} (in-body): {est[len(est)//2]:.1f} Gnnz/s/chip "
              f"(spread {est[0]:.1f}-{est[-1]:.1f})", flush=True)


main()
