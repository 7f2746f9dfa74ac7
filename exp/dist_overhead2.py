"""Bisect: variant-C body (270) vs real dist_matrix_powers (151)."""
import os, sys, time
from functools import partial
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.parallel.distributed import DistDia, _powers_local, dist_matrix_powers
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

def timed(fn, x, lo=2, hi=12, trials=3):
    float(fn(x, lo)); float(fn(x, hi))
    def t(reps):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter(); float(fn(x, reps)); ts.append(time.perf_counter()-t0)
        return min(ts)
    tl, th = t(lo), t(hi)
    return nnz * s * (hi - lo) / (th - tl) / 1e9

# D: real _powers_local body via shard_map, direct consumer
inner = partial(_powers_local, offsets=Ad.offsets, halo=Ad.halo,
                n_shards=Ad.n_shards, s=s, fused_w=Ad.fused_w, m_pad=Ad.m_pad,
                fused_tile=Ad.fused_tile, fused_interpret=False,
                transposed=True, include_q=False)

def body(data_block, dflat_block, x_local, dg, sb):
    return inner(data_block[0], x_local, dg, sb, dflat_local=dflat_block[0])

@partial(jax.jit, static_argnames=("reps",))
def chain_d(x, reps):
    def it(i, v):
        W = jax.shard_map(body, mesh=mesh,
            in_specs=(PartitionSpec(ROWS),)*3 + (PartitionSpec(), PartitionSpec()),
            out_specs=PartitionSpec(None, ROWS))(Ad.data, Ad.dflat, v, z, z)
        return W[s - 1]
    return jnp.sum(lax.fori_loop(0, reps, it, x))

print(f"D real body direct: {timed(chain_d, xs):.1f} Gnnz/s", flush=True)

# E: the public dist_matrix_powers
@partial(jax.jit, static_argnames=("reps",))
def chain_e(x, reps):
    def it(i, v):
        V = dist_matrix_powers(Ad, v, s, z, z, mesh)
        return V[:, s]
    return jnp.sum(lax.fori_loop(0, reps, it, x))

print(f"E dist_matrix_powers: {timed(chain_e, xs):.1f} Gnnz/s", flush=True)

# F: body with in-body concat (include_q=True, transposed), no outer .T
inner_f = partial(_powers_local, offsets=Ad.offsets, halo=Ad.halo,
                  n_shards=Ad.n_shards, s=s, fused_w=Ad.fused_w, m_pad=Ad.m_pad,
                  fused_tile=Ad.fused_tile, fused_interpret=False,
                  transposed=True, include_q=True)

def body_f(data_block, dflat_block, x_local, dg, sb):
    return inner_f(data_block[0], x_local, dg, sb, dflat_local=dflat_block[0])

@partial(jax.jit, static_argnames=("reps",))
def chain_f(x, reps):
    def it(i, v):
        W = jax.shard_map(body_f, mesh=mesh,
            in_specs=(PartitionSpec(ROWS),)*3 + (PartitionSpec(), PartitionSpec()),
            out_specs=PartitionSpec(None, ROWS))(Ad.data, Ad.dflat, v, z, z)
        return W[s]
    return jnp.sum(lax.fori_loop(0, reps, it, x))

print(f"F in-body concat, no T: {timed(chain_f, xs):.1f} Gnnz/s", flush=True)

# G: D + outer concat (no transpose), consumer V[s]
@partial(jax.jit, static_argnames=("reps",))
def chain_g(x, reps):
    def it(i, v):
        W = jax.shard_map(body, mesh=mesh,
            in_specs=(PartitionSpec(ROWS),)*3 + (PartitionSpec(), PartitionSpec()),
            out_specs=PartitionSpec(None, ROWS))(Ad.data, Ad.dflat, v, z, z)
        V = jnp.concatenate([v[None, :], W], axis=0)
        return V[s]
    return jnp.sum(lax.fori_loop(0, reps, it, x))

print(f"G outer concat, no T: {timed(chain_g, xs):.1f} Gnnz/s", flush=True)

# H: D + outer concat + .T, consumer V[:, s]
@partial(jax.jit, static_argnames=("reps",))
def chain_h(x, reps):
    def it(i, v):
        W = jax.shard_map(body, mesh=mesh,
            in_specs=(PartitionSpec(ROWS),)*3 + (PartitionSpec(), PartitionSpec()),
            out_specs=PartitionSpec(None, ROWS))(Ad.data, Ad.dflat, v, z, z)
        V = jnp.concatenate([v[None, :], W], axis=0).T
        return V[:, s]
    return jnp.sum(lax.fori_loop(0, reps, it, x))

print(f"H outer concat + T: {timed(chain_h, xs):.1f} Gnnz/s", flush=True)
