"""True-residual validation over the corpus (round-2 hardening).

The corpus campaign (exp/corpus_campaign.py) scored eigenVALUE error
against dense oracles; the dist Q_cycle misassembly showed that value
error alone can hide O(1e-3) RITZ-VECTOR defects (values come from host
math on T, vectors from the assembled basis).  This sweep runs the
flagship once per corpus matrix at the reference config (s=6, newton,
full orth) and records max ||A x - lambda x|| over the locked pairs —
the check the reference itself never runs (its harness trusts the
estimate, test_restarted_ca_lanczos_all_matrices.m:59).

Appends to results/corpus_residuals.jsonl.
"""
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
from ca_lanczos_tpu.harness.auto import solve_auto
from ca_lanczos_tpu.harness.corpus import build_corpus
from ca_lanczos_tpu.ops.spmv import spmv

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "corpus_residuals.jsonl")


def main():
    corpus = build_corpus()
    print(f"{len(corpus)} matrices", flush=True)
    recs = []
    for name, (A, oracle) in corpus.items():
        t0 = time.time()
        cfg = LanczosConfig(
            n_wanted=10, s=6, basis=Basis.NEWTON, orth=Orth.FULL, tol=1e-8,
            max_restarts=200,
        )
        rng = np.random.default_rng(0)
        try:
            res = solve_auto(A, rng.standard_normal(A.shape[0]), 60, cfg)
        except Exception as e:
            recs.append(dict(matrix=name, error=f"{type(e).__name__}: {e}"))
            print(f"{name:24s} ERROR {e}", flush=True)
            continue
        Q = np.asarray(res.Q_conv) if res.Q_conv is not None else None
        worst = 0.0
        norm_A = float(np.max(np.abs(oracle)))
        k = len(np.atleast_1d(res.eigs))
        if Q is not None:
            for j in range(min(k, Q.shape[1])):
                q = Q[:, j]
                nq = np.linalg.norm(q)
                if nq == 0 or not np.isfinite(nq):
                    continue
                q = q / nq
                lam = float(q @ np.asarray(spmv(A, jnp.asarray(q))))
                rres = float(
                    np.linalg.norm(np.asarray(spmv(A, jnp.asarray(q))) - lam * q)
                ) / norm_A
                worst = max(worst, rres)
        rec = dict(
            matrix=name, n=int(A.shape[0]), solver=res.solver,
            escalated=bool(res.escalated), converged=bool(res.converged),
            nconv=k, worst_rel_residual=worst,
            wall_s=round(time.time() - t0, 1),
        )
        recs.append(rec)
        print(f"{name:24s} conv={rec['converged']} nconv={k:2d} "
              f"worst rel res={worst:.2e} ({rec['solver']}"
              f"{' ESC' if rec['escalated'] else ''}) {rec['wall_s']}s",
              flush=True)
    with open(OUT, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    bad = [r for r in recs if r.get("worst_rel_residual", 1) > 1e-7]
    print(f"\n{len(recs)} matrices, {len(bad)} with rel residual > 1e-7",
          flush=True)


if __name__ == "__main__":
    main()
