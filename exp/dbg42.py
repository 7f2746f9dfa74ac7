"""Bisect the 4.2M-row fused-solve TPU worker crash (round 3).

Modes (argv[1]):
  kern  - standalone roll fused kernel chain at the driver's exact statics
  mp0   - fused solve, roll kernel, mixed_precision=False
  xla   - fused solve, XLA scan powers (use_pallas=False), mp=True
  roll2m- fused solve, roll kernel, mp=True, n=2^21
  ilv   - fused solve on the ilv carrier, mp=True
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
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos
from exp.ilv_e2e import build_op

mode = sys.argv[1]
n = 1 << 21 if mode == "roll2m" else 1 << 22
data, offsets = build_op(n)
r = jnp.ones(n, jnp.float32)
kw = dict(n_wanted=10, s=8, tol=1e-7)

if mode == "kern":
    from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused, dia_flat_padded

    A = DiaMatrix(data=jnp.asarray(data), offsets=offsets)
    dflat = dia_flat_padded(A, 1024)
    coefs = jnp.zeros((8, 2), jnp.float32)

    @jax.jit
    def chain(x):
        for _ in range(3):
            _, x = _dia_powers_fused(dflat, x, coefs, offsets, 8,
                                     tile=65536, W=1024)
        return x

    t0 = time.perf_counter()
    out = np.asarray(chain(r))
    print(f"kern ok: {time.perf_counter()-t0:.1f}s, |out|={np.linalg.norm(out):.3e}",
          flush=True)
elif mode.startswith("ilv"):
    from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix, ilv_encode

    # ilv = full 48-vector config; ilv16 / ilv32 shrink the basis (and
    # the XLA temp plan roughly linearly) to separate memory pressure
    # from kernel-in-program faults; ilv48r5 bounds max_restarts to test
    # the relay execution-time-limit hypothesis (the whole while_loop is
    # ONE device call)
    rest = mode[3:]
    if "r" in rest:
        rest, rmax = rest.split("r")
        kw["max_restarts"] = int(rmax)
    m = int(rest) if rest else 48
    A = IlvDiaMatrix.from_dia(DiaMatrix(data=data, offsets=offsets))
    rr = jnp.asarray(ilv_encode(np.ones(n, np.float32)))
    t0 = time.perf_counter()
    res = fused_restarted_ca_lanczos(A, rr, m, mixed_precision=True, **kw)
    print(f"{mode} ok: conv={res.converged} restarts={res.n_restarts} "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
else:
    A = DiaMatrix(data=jnp.asarray(data), offsets=offsets)
    mp = mode != "mp0"
    up = None if mode != "xla" else False
    t0 = time.perf_counter()
    res = fused_restarted_ca_lanczos(A, r, 48, mixed_precision=mp,
                                     use_pallas=up, **kw)
    print(f"{mode} ok: conv={res.converged} restarts={res.n_restarts} "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
