"""North-star >=10M-row flagship, host-driven leg (round-3 VERDICT
item 2).  The one-XLA-call driver's large mixed-precision program
crashes the relay worker at n >= ~4M (see exp/dbg42.py bisection;
per-op probes all pass — the fault is compositional), so this records
the north-star through the HOST restarted driver: per-block jitted
device work (ILV powers kernel + mixed-precision CholQR2/Gram) with the
restart state machine on host — small programs, same numerics.

Operator: 11,010,048 rows, 9 diagonals (the bench operator family) with
a separated top cluster; scipy eigsh f64 oracle (cached).
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
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ca_lanczos_tpu.config import Basis, LanczosConfig, Orth, OrthParams, QrMethod
from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix, ilv_encode
from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.restarted import restarted_ca_lanczos
from exp.ilv_e2e import build_op

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n = 10 * (1 << 20) + (1 << 19)  # 11,010,048 rows
    data, offsets = build_op(n)
    nnz = sum(n - abs(k) for k in offsets)

    cache = os.path.join(ROOT, "exp", f"flagship_10m9d_oracle_{n}.npz")
    t0 = time.perf_counter()
    if os.path.exists(cache):
        exact = np.load(cache)["exact"]
        print("oracle (cached)", flush=True)
    else:
        # scipy diags convention: for offset k >= 0 it expects A[i, i+k]
        # for i in [0, n-k); for k < 0 it expects A[i, i+k] for
        # i in [|k|, n) — ours stores data[d, i] = A[i, i+k]
        mats = []
        for i, k in enumerate(offsets):
            v = data[i].astype(np.float64)
            mats.append(sp.diags(v[: n - abs(k)] if k >= 0 else v[abs(k):], k))
        a = sum(mats).tocsr()
        exact = np.sort(spla.eigsh(a, k=10, which="LA",
                                   return_eigenvectors=False))[::-1]
        np.savez(cache, exact=exact)
        print(f"oracle eigsh: {time.perf_counter()-t0:.1f}s", flush=True)

    A = IlvDiaMatrix.from_dia(DiaMatrix(data=data, offsets=offsets))
    r = jnp.asarray(ilv_encode(np.ones(n, np.float32)))
    cfg = LanczosConfig(
        s=8, basis=Basis.NEWTON, orth=Orth.LOCAL, n_wanted=10,
        tol=1e-7, max_restarts=60,
        orth_params=OrthParams(qr_method=QrMethod.CHOLQR2,
                               mixed_precision=True),
    )
    t0 = time.perf_counter()
    res = restarted_ca_lanczos(A, r, 48, cfg)
    wall = time.perf_counter() - t0
    got = np.sort(np.asarray(res.eigs))[::-1]
    err = np.max(np.abs(got[:10] - exact[: len(got[:10])])) / np.abs(exact[0])
    eff_gnnz = res.n_restarts * (48 // 8) * 8 * nnz / wall / 1e9
    print(
        f"10M host flagship: converged={res.converged} "
        f"n_restarts={res.n_restarts} eig_rel_err={err:.2e} "
        f"wall={wall:.1f}s (powers-only effective ~{eff_gnnz:.0f} Gnnz/s "
        f"incl host latency)",
        flush=True,
    )


if __name__ == "__main__":
    main()
