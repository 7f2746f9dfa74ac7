"""Hard-case addendum, part 2: the clustered-top corpus matrices that
explicit restart cannot converge at the reference budget (maxvecs=60)
run through the implicitly-restarted driver with locking at the SAME
budget.  Thick implicit restart retains the near-degenerate directions
(including multiplet partners, which explicit single-vector restart can
only recover from rounding noise), so these cases converge without any
extra basis size."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu.config import Basis, Orth
from ca_lanczos_tpu.harness.corpus import build_corpus
from ca_lanczos_tpu.solvers.implicitly_restarted import impl_restarted_ca_lanczos

HARD = [
    "stiff_1d", "stiff_beam4", "indef_scaled_band",
    "graph_geometric_rcm", "ring_periodic", "mesh_2d_aniso",
]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "corpus_hard_irl.jsonl")


def main():
    corpus = build_corpus(small=False)
    rng = np.random.default_rng(0)
    with open(OUT, "w") as f:
        for name in HARD:
            A, exact = corpus[name]
            r = jnp.asarray(rng.random(A.shape[0]))
            t0 = time.perf_counter()
            try:
                res = impl_restarted_ca_lanczos(
                    A, r, 60, n_wanted=10, s=6, basis=Basis.NEWTON,
                    orth=Orth.FULL, tol=1e-8, max_restarts=100,
                )
                got = np.sort(np.asarray(res.eigs))[::-1]
                err = float(np.max(np.min(
                    np.abs(got[:, None] - exact[None, :]), axis=1))) if len(got) else None
                rec = dict(matrix=name, solver="impl_restarted_ca_lanczos",
                           max_lanczos=60, converged=bool(res.converged),
                           n_conv=int(len(got)), n_restarts=int(res.n_restarts),
                           nearest_eig_err=err,
                           wall_s=round(time.perf_counter() - t0, 1))
            except Exception as e:
                rec = dict(matrix=name, solver="impl_restarted_ca_lanczos",
                           max_lanczos=60,
                           error=f"{type(e).__name__}: {e}"[:200])
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)


if __name__ == "__main__":
    main()
