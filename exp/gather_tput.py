"""Raw throughput of chained (R,128) lane-gathers on this TPU."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

R, ITERS = 1024, 256


def kernel(x_ref, i_ref, o_ref):
    x = x_ref[:]
    idx = i_ref[:]
    for _ in range(ITERS):
        x = jnp.take_along_axis(x, idx, axis=1)
    o_ref[:] = x


@jax.jit
def chain(x, idx, reps):
    g = lambda v: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
    )(v, idx)

    def body(t, v):
        return g(v)

    return jnp.sum(lax.fori_loop(0, reps, body, x))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    idx = jnp.asarray(rng.permutation(np.tile(np.arange(128), (R, 1)), axis=1), jnp.int32)
    lo, hi = 100, 1100
    float(chain(x, idx, lo)); float(chain(x, idx, hi))
    t0 = time.perf_counter(); float(chain(x, idx, lo)); tlo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(x, idx, hi)); thi = time.perf_counter() - t0
    n = R * 128 * ITERS * (hi - lo)
    print(f"lane-gather tput: {n / (thi - tlo) / 1e9:.1f} Gelem/s  (R={R}, iters={ITERS})")


main()
