"""Routed corpus campaign: every case of the reference sweep
(test_restarted_ca_lanczos_all_matrices.m:59 — s x orth over the corpus)
that the explicit-restart flagship left unconverged at the reference
budget is rerun through the escalation ladder (harness.auto._ladder):
IRL at the case's own (s, orth), then the numerically-safe rescue legs
(full orth at the case's s; s=4 full-orth for both drivers) — the same
ladder production ``solve_auto`` walks.  The budget never grows.
Appends one JSON line per rescued case to results/corpus_routed.jsonl
and writes the combined pipeline summary to
results/corpus_summary_routed.json.
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
from ca_lanczos_tpu.harness.auto import _ladder, _run
from ca_lanczos_tpu.harness.corpus import build_corpus

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(ROOT, "results", "corpus_sweep.jsonl")
OUT = os.path.join(ROOT, "results", "corpus_routed.jsonl")
SUMMARY = os.path.join(ROOT, "results", "corpus_summary_routed.json")

N_WANTED = 10
MAX_LANCZOS = 60
TOL = 1e-8


def main():
    cases = []
    total = 0
    base_converged = 0
    with open(SWEEP) as f:
        for line in f:
            d = json.loads(line)
            total += 1
            if d.get("converged", False):
                base_converged += 1
            else:
                cases.append(d)
    print(f"{total} sweep cases, {base_converged} converged, "
          f"{len(cases)} to route", flush=True)

    seen = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    d = json.loads(line)
                    # only skip cases a previous run CONVERGED; failures
                    # rerun through the (extended) ladder, and the
                    # summary pass below keeps the last record per key
                    if d.get("converged"):
                        seen.add((d["matrix"], d["s"], d["orth"]))
                except Exception:
                    pass

    corpus = build_corpus(small=False)
    rng = np.random.default_rng(0)
    starts = {}
    rescued = 0
    with open(OUT, "a") as f:
        for d in cases:
            key = (d["matrix"], d["s"], d["orth"])
            if key in seen:
                continue
            A, exact = corpus[d["matrix"]]
            if d["matrix"] not in starts:
                starts[d["matrix"]] = rng.random(A.shape[0])
            r = jnp.asarray(starts[d["matrix"]])
            exact_top = np.sort(exact)[::-1][:N_WANTED]
            scale = max(np.max(np.abs(exact_top)), 1e-300)
            cfg = LanczosConfig(
                s=d["s"], basis=Basis.NEWTON, orth=Orth(d["orth"]),
                n_wanted=N_WANTED, tol=TOL, max_restarts=100,
            )
            # the sweep case itself was the explicit driver at this
            # config — drop that rung, walk the rest of the ladder
            attempts = [
                a for a in _ladder(
                    cfg, "impl_restarted_ca_lanczos", "restarted_ca_lanczos"
                )
                if a[2] != "restarted_ca_lanczos"
            ]
            t0 = time.perf_counter()
            rec = None
            for name, c, label in attempts:
                try:
                    res = _run(name, A, r, MAX_LANCZOS, c)
                    got = np.sort(np.asarray(res.eigs))[::-1]
                    err = (
                        float(np.max(np.min(
                            np.abs(got[:, None] - exact[None, :]), axis=1
                        )) / scale)
                        if len(got) else None
                    )
                    rec = dict(
                        matrix=d["matrix"], s=d["s"], orth=d["orth"],
                        solver=label,
                        converged=bool(res.converged), n_conv=int(len(got)),
                        n_restarts=int(res.n_restarts), nearest_eig_err=err,
                        wall_s=round(time.perf_counter() - t0, 2),
                    )
                except Exception as e:
                    rec = dict(
                        matrix=d["matrix"], s=d["s"], orth=d["orth"],
                        solver=label, converged=False,
                        error=f"{type(e).__name__}: {e}"[:200],
                    )
                if rec.get("converged"):
                    break
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if rec.get("converged"):
                rescued += 1
            print(rec, flush=True)

    # combined summary over the full sweep grid
    routed = {}
    with open(OUT) as f:
        for line in f:
            d = json.loads(line)
            routed[(d["matrix"], d["s"], d["orth"])] = d
    per_matrix = {}
    pipeline_converged = 0
    with open(SWEEP) as f:
        for line in f:
            d = json.loads(line)
            m = d["matrix"]
            pm = per_matrix.setdefault(
                m, {"total": 0, "explicit": 0, "escalated": 0, "failed": 0})
            pm["total"] += 1
            if d.get("converged", False):
                pm["explicit"] += 1
                pipeline_converged += 1
            else:
                r2 = routed.get((m, d["s"], d["orth"]))
                if r2 and r2.get("converged"):
                    pm["escalated"] += 1
                    pipeline_converged += 1
                else:
                    pm["failed"] += 1
    summary = dict(
        cases=total,
        pipeline_converged=pipeline_converged,
        explicit_converged=base_converged,
        escalated_converged=pipeline_converged - base_converged,
        per_matrix=per_matrix,
    )
    with open(SUMMARY, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "per_matrix"}),
          flush=True)


if __name__ == "__main__":
    main()
