"""Probe dynamic sublane indexing of VMEM refs + in-kernel computed gather idx."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


# G: dynamic sublane row read x_ref[i, :] with i from SMEM
def probe_g():
    def k(i_ref, x_ref, o_ref):
        r = i_ref[0]
        o_ref[:] = jnp.broadcast_to(x_ref[r, :], (8, 128))

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    i = jnp.asarray([13], jnp.int32)
    out = pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(i, x)
    ref = jnp.broadcast_to(x[13], (8, 128))
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# H: dynamic sublane read where the index comes from a VMEM int tile reduced to scalar
def probe_h():
    def k(i_ref, x_ref, o_ref):
        r = i_ref[0, 0]
        o_ref[:] = jnp.broadcast_to(x_ref[r, :], (8, 128))

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    i = jnp.full((1, 1), 13, jnp.int32)
    out = pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(i, x)
    ref = jnp.broadcast_to(x[13], (8, 128))
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# I: in-kernel computed gather indices (arith on idx before take_along)
def probe_i():
    def k(x_ref, i_ref, o_ref):
        idx = (i_ref[:] * 7 + 3) % 128
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    idx0 = jnp.asarray(np.random.default_rng(0).integers(0, 128, (16, 128)), jnp.int32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(
        x, idx0
    )
    ref = jnp.take_along_axis(x, (idx0 * 7 + 3) % 128, axis=1)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# J: int8 idx storage upcast in kernel
def probe_j():
    def k(x_ref, i_ref, o_ref):
        idx = i_ref[:].astype(jnp.int32)
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    idx0 = jnp.asarray(np.random.default_rng(0).integers(0, 128, (16, 128)), jnp.int8)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(
        x, idx0
    )
    ref = jnp.take_along_axis(x, idx0.astype(jnp.int32), axis=1)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# K: sublane-sum of (32,128) -> (1,128) then writing 128-slice of output
def probe_k():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)

    x = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32))(x)
    ref = jnp.sum(x, axis=0, keepdims=True)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


probe("G dyn sublane row (SMEM idx)", probe_g)
probe("H dyn sublane row (1,1) SMEM", probe_h)
probe("I computed idx", probe_i)
probe("J int8 idx upcast", probe_j)
probe("K sublane reduce", probe_k)
