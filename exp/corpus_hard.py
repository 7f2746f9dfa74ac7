"""Addendum to the corpus campaign: the six clustered-top matrices that
cannot converge 10 pairs at the reference budget (maxvecs=60) get a
larger-basis pass to quantify what budget they actually need."""
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

from ca_lanczos_tpu.config import Basis, LanczosConfig, Orth
from ca_lanczos_tpu.harness.corpus import build_corpus
from ca_lanczos_tpu.solvers.restarted import restarted_ca_lanczos

HARD = [
    "stiff_1d", "stiff_beam4", "indef_scaled_band",
    "graph_geometric_rcm", "ring_periodic", "mesh_2d_aniso",
]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "corpus_hard.jsonl")


def main():
    corpus = build_corpus(small=False)
    rng = np.random.default_rng(0)
    with open(OUT, "a") as f:
        for name in HARD:
            A, exact = corpus[name]
            n = A.shape[0]
            r = jnp.asarray(rng.random(n))
            for maxv in (120, 180):
                cfg = LanczosConfig(
                    s=6, basis=Basis.NEWTON, orth=Orth.FULL,
                    n_wanted=10, tol=1e-8, max_restarts=200,
                )
                t0 = time.perf_counter()
                try:
                    res = restarted_ca_lanczos(A, r, maxv, cfg)
                    got = np.sort(np.asarray(res.eigs))[::-1]
                    err = float(np.max(np.min(
                        np.abs(got[:, None] - exact[None, :]), axis=1))) if len(got) else None
                    rec = dict(matrix=name, max_lanczos=maxv,
                               converged=bool(res.converged),
                               n_conv=int(len(got)),
                               n_restarts=res.n_restarts,
                               nearest_eig_err=err,
                               wall_s=round(time.perf_counter() - t0, 1))
                except Exception as e:
                    rec = dict(matrix=name, max_lanczos=maxv,
                               error=f"{type(e).__name__}: {e}"[:200])
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(rec, flush=True)
                if rec.get("converged"):
                    break


main()
