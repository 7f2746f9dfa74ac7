"""ILV production wiring on hardware (round-3 VERDICT item 1 done-check):
the SAME one-XLA-call flagship solve on (a) the roll-based fused powers
kernel (DiaMatrix) and (b) the interleaved carrier (IlvDiaMatrix), on a
4.2M-row 9-diagonal symmetric operator with a separated top cluster.

Success = eigenvalue parity between the paths and a measurable warm-wall
drop on (b).  Reference seam: restarted_ca_lanczos.m:83-181 (the restart
loop whose powers blocks dominate at this scale).
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

from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix, ilv_encode
from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos


def build_op(n):
    """Symmetric 9-diagonal operator: separated top cluster on the main
    diagonal, small random symmetric band (host f32 planes)."""
    rng = np.random.default_rng(42)
    main = np.linspace(1.0, 90.0, n).astype(np.float32)
    main[-10:] = np.linspace(95.0, 100.0, 10).astype(np.float32)
    offsets = (-4, -3, -2, -1, 0, 1, 2, 3, 4)
    data = np.zeros((9, n), np.float32)
    data[4] = main
    for k in range(1, 5):
        u = (rng.standard_normal(n) * 0.02).astype(np.float32)
        u[n - k:] = 0.0
        data[4 + k] = u                      # A[i, i+k]
        data[4 - k] = np.roll(u, k)          # A[i, i-k] = u[i-k]
        data[4 - k][:k] = 0.0
    return data, offsets


def main():
    args = sys.argv[1:]
    n = 1 << 22  # 4.2M rows default
    for a in list(args):
        if a.startswith("n="):
            n = 1 << int(a[2:])
            args.remove(a)
    data, offsets = build_op(n)
    kw = dict(n_wanted=10, s=8, tol=1e-7, mixed_precision=True)
    r = jnp.ones(n, jnp.float32)

    results = {}
    for path in args or ("roll", "ilv"):
        if path == "roll":
            A = DiaMatrix(data=jnp.asarray(data), offsets=offsets)
            rr = r
        else:
            A = IlvDiaMatrix.from_dia(DiaMatrix(data=data, offsets=offsets))
            rr = jnp.asarray(ilv_encode(np.ones(n, np.float32)))
        t0 = time.perf_counter()
        res = fused_restarted_ca_lanczos(A, rr, 48, **kw)
        print(f"{path}: cold (incl compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = fused_restarted_ca_lanczos(A, rr, 48, **kw)
            walls.append(time.perf_counter() - t0)
        eigs = np.sort(res.eigs[np.isfinite(res.eigs)])[::-1]
        results[path] = (eigs, res)
        print(
            f"{path}: converged={res.converged} n_restarts={res.n_restarts} "
            f"warm_wall={min(walls):.2f}s (of {['%.2f' % w for w in walls]}) "
            f"top3={eigs[:3]}",
            flush=True,
        )

    if len(results) == 2:
        e_roll, e_ilv = results["roll"][0], results["ilv"][0]
        m = min(len(e_roll), len(e_ilv))
        print(f"eig parity max abs diff: {np.max(np.abs(e_roll[:m] - e_ilv[:m])):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
