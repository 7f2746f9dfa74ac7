"""Probe which gather-ish primitives Mosaic supports on this TPU.

Decides the general-sparsity kernel design (windowed-gather ELL vs
block-sparse scalar-prefetch).  Each probe is tiny and independent.
"""
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("platform:", jax.devices()[0].platform, file=sys.stderr)


def probe(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


# A: take_along_axis lanes, same-shape (8,128)
def probe_a():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 128, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, idx)
    ref = jnp.take_along_axis(x, idx, axis=1)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# B: take_along_axis lanes, (8,512) with indices spanning all 512 lanes
def probe_b():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 512, (8, 512)), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32)
    )(x, idx)
    ref = jnp.take_along_axis(x, idx, axis=1)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# C: take_along_axis along sublanes (axis=0), (8,128)
def probe_c():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 8, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, idx)
    ref = jnp.take_along_axis(x, idx, axis=0)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# D: bigger 2-D gather: x (256,512) gathered along lanes
def probe_d():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(256 * 512, dtype=jnp.float32).reshape(256, 512)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 512, (256, 512)), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32)
    )(x, idx)
    ref = jnp.take_along_axis(x, idx, axis=1)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# E: gather rows of a 2-D (W,128) x by per-sublane row index: emulate wide window
#    y[j,:] = x[idx[j], :]  -- take axis=0 with 1-D row indices
def probe_e():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[0, :8], axis=0)

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 64, (1, 128)), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x, idx)
    ref = jnp.take(x, idx[0, :8], axis=0)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


# F: pltpu.roll with dynamic shift
def probe_f():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    s = jnp.asarray([5], jnp.int32)
    out = pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x, s)
    ref = jnp.roll(x, 5, axis=1)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


probe("A take_along lanes (8,128)", probe_a)
probe("B take_along lanes (8,512)", probe_b)
probe("C take_along sublanes (8,128)", probe_c)
probe("D take_along lanes (256,512)", probe_d)
probe("E take rows axis0", probe_e)
probe("F pltpu.roll dynamic", probe_f)
