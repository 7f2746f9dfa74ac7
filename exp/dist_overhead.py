"""Isolate where the dist P=1 fused powers loses vs single-chip 330."""
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
from jax.sharding import PartitionSpec

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused
from ca_lanczos_tpu.parallel.distributed import DistDia, _halo_exchange
from ca_lanczos_tpu.parallel.mesh import ROWS, make_mesh

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
q = np.asarray(rng.standard_normal(n), np.float32)
xs = Ad.shard_vector(q / np.linalg.norm(q), mesh)
z = jnp.zeros(s, jnp.float32)
coefs = jnp.zeros((s, 2), jnp.float32)


def timed(fn, x, lo=2, hi=12, trials=3):
    float(fn(x, lo)); float(fn(x, hi))

    def t(reps):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(fn(x, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tl, th = t(lo), t(hi)
    return nnz * s * (hi - lo) / (th - tl) / 1e9


def variant(name, body, out_specs):
    @partial(jax.jit, static_argnames=("reps",))
    def chain(x, reps):
        def it(i, v):
            out = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(PartitionSpec(ROWS), PartitionSpec(ROWS), PartitionSpec(ROWS)),
                out_specs=out_specs,
            )(Ad.data, Ad.dflat, v)
            return out

        return jnp.sum(lax.fori_loop(0, reps, it, x))

    print(f"{name}: {timed(chain, xs):.1f} Gnnz/s", flush=True)


# A: kernel only, last-vector output (n_local,) — minimal
def body_a(dblk, fblk, x_local):
    xpp = jnp.pad(x_local, (0, Ad.m_pad - x_local.shape[0]))
    ws = _dia_powers_fused(fblk[0], xpp, coefs, offsets, s,
                           tile=Ad.fused_tile, W=Ad.fused_w)
    return ws[s - 1, : x_local.shape[0]]


variant("A kernel-only, (n,) out", body_a, PartitionSpec(ROWS))


# B: + full (s, n_local) output
def body_b(dblk, fblk, x_local):
    xpp = jnp.pad(x_local, (0, Ad.m_pad - x_local.shape[0]))
    ws = _dia_powers_fused(fblk[0], xpp, coefs, offsets, s,
                           tile=Ad.fused_tile, W=Ad.fused_w)
    return ws[:, : x_local.shape[0]]


@partial(jax.jit, static_argnames=("reps",))
def chain_b(x, reps):
    def it(i, v):
        out = jax.shard_map(
            body_b, mesh=mesh,
            in_specs=(PartitionSpec(ROWS),) * 3,
            out_specs=PartitionSpec(None, ROWS),
        )(Ad.data, Ad.dflat, v)
        return out[s - 1]

    return jnp.sum(lax.fori_loop(0, reps, it, x))


print(f"B +(s,n) out: {timed(chain_b, xs):.1f} Gnnz/s", flush=True)


# C: + halo exchange & center slice (the real _powers_local data flow)
def body_c(dblk, fblk, x_local):
    xp = _halo_exchange(x_local, Ad.halo, Ad.n_shards)
    xpp = jnp.pad(xp, (0, Ad.m_pad - xp.shape[0]))
    ws = _dia_powers_fused(fblk[0], xpp, coefs, offsets, s,
                           tile=Ad.fused_tile, W=Ad.fused_w)
    return ws[:, Ad.halo : Ad.halo + x_local.shape[0]]


@partial(jax.jit, static_argnames=("reps",))
def chain_c(x, reps):
    def it(i, v):
        out = jax.shard_map(
            body_c, mesh=mesh,
            in_specs=(PartitionSpec(ROWS),) * 3,
            out_specs=PartitionSpec(None, ROWS),
        )(Ad.data, Ad.dflat, v)
        return out[s - 1]

    return jnp.sum(lax.fori_loop(0, reps, it, x))


print(f"C +halo+slice: {timed(chain_c, xs):.1f} Gnnz/s", flush=True)
