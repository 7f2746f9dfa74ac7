"""End-to-end GENERAL-SPARSITY eigensolve on hardware: ca_lanczos rides
the PELL Pallas kernel (matrix_powers dispatch) on a 262k-row 3-D
27-point Laplacian — sparsity far beyond the banded DIA kernel's reach.
Oracle: scipy eigsh extreme eigenvalues.  x64 stays OFF so the Mosaic
path is active (see BENCHMARKS.md x64 caveat)."""
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
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ca_lanczos_tpu.config import Basis, Orth, OrthParams, QrMethod
from ca_lanczos_tpu.ops.pell import PellMatrix
from ca_lanczos_tpu.solvers.ca_lanczos import ca_lanczos


def laplacian_3d_27pt(m):
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (m, m))
    return (sp.kron(sp.kron(d1, d1), d1) * (1.0 / 27.0)).tocsr()


def main():
    m = 64
    a = laplacian_3d_27pt(m).astype(np.float32)
    n = a.shape[0]
    t0 = time.perf_counter()
    A = PellMatrix.from_scipy(a, tile=1024)
    print(f"n={n} nnz={a.nnz} K={A.k_slots} W={A.n_win} "
          f"encode+upload={time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    lam_max = float(spla.eigsh(a.astype(np.float64), k=1, which="LA",
                               return_eigenvectors=False)[0])
    print(f"oracle eigsh LA: {lam_max:.8f} ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.random(n), jnp.float32)
    params = OrthParams(qr_method=QrMethod.CHOLQR2)
    for trial in range(2):  # trial 0 pays compile, trial 1 is warm
        t0 = time.perf_counter()
        res = ca_lanczos(A, r, 8, 128, basis=Basis.NEWTON, orth=Orth.LOCAL,
                         params=params)
        d = np.linalg.eigvalsh(res.T)
        wall = time.perf_counter() - t0
        err = abs(d[-1] - lam_max) / abs(lam_max)
        print(f"trial {trial}: top ritz {d[-1]:.8f} rel err {err:.2e} "
              f"wall {wall:.1f}s", flush=True)


main()
