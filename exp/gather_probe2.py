"""Shape limits of Mosaic dynamic_gather (fast probes only)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


def gather(shape, idx_hi, axis):
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    x = jnp.arange(shape[0] * shape[1], dtype=jnp.float32).reshape(shape)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, idx_hi, shape), jnp.int32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x, idx)
    ref = jnp.take_along_axis(x, idx, axis=axis)
    return f"maxerr={float(jnp.max(jnp.abs(out - ref)))}"


probe("lanes (256,128)", lambda: gather((256, 128), 128, 1))
probe("sublanes (32,128) idx<32", lambda: gather((32, 128), 32, 0))
probe("sublanes (256,128) idx<256", lambda: gather((256, 128), 256, 0))
probe("lanes (8,256) idx<256", lambda: gather((8, 256), 256, 1))
