"""Hardware validation of the mixed-precision flagship (VERDICT item 5):
1M-row f32 operator with a separated top cluster; f32 storage + f64
reductions must deliver eig error <= 1e-6 (plain f32 showed 6e-2)."""
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
jax.config.update("jax_enable_x64", True)  # required for the f64 reductions of mixed_precision
import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu.config import Basis, LanczosConfig, Orth, OrthParams, QrMethod
from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.restarted import restarted_ca_lanczos


def main():
    n = 1 << 20
    vals = np.linspace(1.0, 90.0, n)
    vals[-10:] = np.linspace(95.0, 100.0, 10)  # separated top cluster
    A = DiaMatrix(data=jnp.asarray(vals, jnp.float32)[None, :], offsets=(0,))
    exact = np.sort(vals)[::-1][:10]
    r = jnp.ones(n, jnp.float32)

    for mp in (True, False):
        cfg = LanczosConfig(
            s=8, basis=Basis.NEWTON, orth=Orth.LOCAL, n_wanted=10, tol=1e-7,
            orth_params=OrthParams(qr_method=QrMethod.CHOLQR2, mixed_precision=mp),
        )
        t0 = time.perf_counter()
        res = restarted_ca_lanczos(A, r, 48, cfg)
        wall = time.perf_counter() - t0
        got = np.sort(np.asarray(res.eigs))[::-1]
        k = min(len(got), 10)
        err = np.max(np.abs(got[:k] - exact[:k])) / 100.0 if k else float("nan")
        print(
            f"mp={mp}: converged={res.converged} n_restarts={res.n_restarts} "
            f"eig_rel_err={err:.2e} wall={wall:.1f}s",
            flush=True,
        )


main()
