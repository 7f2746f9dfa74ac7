"""Real-pattern .mtx matrices through the FULL production pipeline
(round-3 VERDICT item 5): file -> `python -m ca_lanczos_tpu solve --mtx`
(load -> route -> escalation-ladder solve) -> eigsh/dense oracle check,
plus an in-process true-residual audit of the locked vectors.

The reference validates on 105 SuiteSparse matrices
(test_restarted_ca_lanczos_all_matrices.m:6-32); offline, we generate
matrices with AUTHENTIC irregular structure from real sparsity
generators (random-geometry FEM meshes, 3-dof frame stiffness, scale-free
power grids, 3-D tetrahedral meshes, ring-of-cliques finance blocks) —
not bands — matching the reference families bcsstk/nos/plat/bus/finan.

Writes results/mtx_solve.jsonl; matrices land in results/mtx/ (generated,
not committed — seeded and reproducible).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the in-process audit runs on CPU (the environment pins a TPU relay;
# host-driven solves through it pay ~30ms/call)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MTXDIR = os.path.join(ROOT, "results", "mtx")
OUT = os.path.join(ROOT, "results", "mtx_solve.jsonl")


def fem_delaunay_2d(npts=6000, seed=0):
    """nos/plat analogue: Delaunay triangulation of a random 2-D point
    cloud; edge weights = inverse squared length (stiffness-like)."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.random((npts, 2))
    tri = Delaunay(pts)
    edges = set()
    for simplex in tri.simplices:
        for i in range(3):
            a, b = int(simplex[i]), int(simplex[(i + 1) % 3])
            edges.add((min(a, b), max(a, b)))
    e = np.array(sorted(edges))
    d2 = np.sum((pts[e[:, 0]] - pts[e[:, 1]]) ** 2, axis=1)
    w = 1.0 / np.maximum(d2, 1e-8)
    w = np.minimum(w, np.quantile(w, 0.995))  # clip degenerate slivers
    A = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([e[:, 0], e[:, 1]]),
                        np.concatenate([e[:, 1], e[:, 0]]))),
                      shape=(npts, npts)).tocsr()
    deg = np.asarray(A.sum(axis=1)).ravel()
    return (sp.diags(deg) - A).tocsr()


def frame_stiffness_3d(nnodes=3000, seed=1):
    """bcsstk analogue: 3-dof/node frame stiffness.  Nodes = jittered 3-D
    grid; elements = 6-nearest-neighbor bars; per-element stiffness
    k * u u^T on the bar direction assembled into 3x3 node blocks."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    g = int(round(nnodes ** (1 / 3)))
    xs = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"), -1)
    pts = xs.reshape(-1, 3)[:nnodes].astype(float)
    pts += rng.random(pts.shape) * 0.35
    tree = cKDTree(pts)
    _, nbr = tree.query(pts, k=7)
    n = len(pts)
    rows, cols, vals = [], [], []
    diag = np.zeros((n, 3, 3))
    seen = set()
    for i in range(n):
        for j in nbr[i, 1:]:
            j = int(j)
            key = (min(i, j), max(i, j))
            if key in seen:
                continue
            seen.add(key)
            u = pts[j] - pts[i]
            L = np.linalg.norm(u)
            u = u / max(L, 1e-9)
            k = (1.0 + rng.random()) / max(L, 1e-3)
            ke = k * np.outer(u, u)
            diag[i] += ke
            diag[j] += ke
            for a in range(3):
                for b in range(3):
                    rows.append(3 * i + a); cols.append(3 * j + b)
                    vals.append(-ke[a, b])
                    rows.append(3 * j + a); cols.append(3 * i + b)
                    vals.append(-ke[a, b])
    for i in range(n):
        for a in range(3):
            for b in range(3):
                if diag[i, a, b] != 0.0:
                    rows.append(3 * i + a); cols.append(3 * i + b)
                    vals.append(diag[i, a, b] + (0.1 if a == b else 0.0))
    return sp.coo_matrix((vals, (rows, cols)), shape=(3 * n, 3 * n)).tocsr()


def power_grid(n=8000, seed=2):
    """bus analogue: preferential-attachment graph -> nodal admittance
    (Laplacian + random shunt diagonal)."""
    rng = np.random.default_rng(seed)
    targets = []  # endpoint pool for preferential attachment
    rows, cols, vals = [], [], []
    for v in range(1, n):
        m = 1 + (v % 2)  # 1-2 edges per new node
        for _ in range(m):
            if not targets or rng.random() < 0.2:
                u = int(rng.integers(0, v))
            else:
                u = int(targets[rng.integers(0, len(targets))])
            if u == v:
                continue
            y = 1.0 + 9.0 * rng.random()  # line admittance
            rows += [u, v]; cols += [v, u]; vals += [-y, -y]
            targets += [u, v]
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    deg = -np.asarray(A.sum(axis=1)).ravel()
    shunt = 0.05 * rng.random(n)
    return (A + sp.diags(deg + shunt)).tocsr()


def mesh_tet_3d(npts=4000, seed=3):
    """CO/mesh analogue: Delaunay tetrahedralization of a random 3-D
    cloud -> weighted graph Laplacian."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.random((npts, 3))
    tri = Delaunay(pts)
    edges = set()
    for simplex in tri.simplices:
        for i in range(4):
            for j in range(i + 1, 4):
                a, b = int(simplex[i]), int(simplex[j])
                edges.add((min(a, b), max(a, b)))
    e = np.array(sorted(edges))
    w = 1.0 + rng.random(len(e))
    A = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([e[:, 0], e[:, 1]]),
                        np.concatenate([e[:, 1], e[:, 0]]))),
                      shape=(npts, npts)).tocsr()
    deg = np.asarray(A.sum(axis=1)).ravel()
    return (sp.diags(deg) - A).tocsr()


def finance_cliques(ncliq=220, cs=24, seed=4):
    """finan512 analogue: ring of dense cliques with sparse inter-clique
    coupling and an SPD shift."""
    rng = np.random.default_rng(seed)
    n = ncliq * cs
    blocks = []
    for c in range(ncliq):
        B = rng.standard_normal((cs, cs)) * 0.2
        B = B @ B.T  # dense SPD clique
        blocks.append(sp.coo_matrix(B))
    A = sp.block_diag(blocks).tolil()
    for c in range(ncliq):  # ring coupling: a few cross entries
        d = (c + 1) % ncliq
        for _ in range(4):
            i = c * cs + int(rng.integers(cs))
            j = d * cs + int(rng.integers(cs))
            v = 0.1 * rng.standard_normal()
            A[i, j] += v
            A[j, i] += v
    A = A.tocsr()
    return (A + sp.eye(n) * (1.0 + abs(min(0.0, np.min(A.diagonal()))))).tocsr()


GENERATORS = [
    ("fem_delaunay_2d", fem_delaunay_2d),
    ("frame_stiffness_3d", frame_stiffness_3d),
    ("power_grid_pa", power_grid),
    ("mesh_tet_3d", mesh_tet_3d),
    ("finance_cliques", finance_cliques),
]


def main():
    os.makedirs(MTXDIR, exist_ok=True)
    sys.path.insert(0, ROOT)
    recs = []
    for name, gen in GENERATORS:
        path = os.path.join(MTXDIR, f"{name}.mtx")
        if not os.path.exists(path):
            a = gen()
            # reference normalization: A / ||A||_inf
            # (test_restarted_ca_lanczos_all_matrices.m:31-32)
            a = a / sp.linalg.norm(a, np.inf)
            from scipy.io import mmwrite

            mmwrite(path, a.tocoo(), symmetry="symmetric", precision=17)
        from scipy.io import mmread

        a = mmread(path).tocsr()
        n = a.shape[0]
        print(f"{name}: n={n} nnz={a.nnz}", flush=True)

        # oracle: top eigenvalues
        from scipy.sparse.linalg import eigsh

        oracle = np.sort(eigsh(a, k=10, which="LA",
                               return_eigenvectors=False))[::-1]

        # full pipeline through the CLI (file -> route -> ladder solve)
        outj = os.path.join(MTXDIR, f"{name}.solve.json")
        t0 = time.perf_counter()
        cmd = [
            sys.executable, "-m", "ca_lanczos_tpu", "solve",
            "--mtx", path, "--tol", "1e-9", "--out", outj,
        ]  # main-parser --platform defaults to cpu
        cp = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                            timeout=3600)
        wall = time.perf_counter() - t0
        if cp.returncode != 0:
            print(cp.stdout[-2000:], cp.stderr[-2000:], flush=True)
            recs.append(dict(matrix=name, error="cli failed"))
            continue
        rec = json.loads(open(outj).read().strip())
        got = np.asarray(rec["eigs"], float)[:10]
        scale = max(abs(oracle[0]), 1e-300)
        eig_err = float(np.max(np.abs(got - oracle[: len(got)])) / scale)

        # in-process audit: true residuals of the locked vectors
        from ca_lanczos_tpu.config import LanczosConfig, Orth
        from ca_lanczos_tpu.harness.auto import solve_auto

        rng = np.random.default_rng(0)
        res = solve_auto(a, rng.standard_normal(n), 60,
                         LanczosConfig(tol=1e-9, orth=Orth.FULL))
        worst = None
        if res.Q_conv is not None and res.converged:
            Q = np.asarray(res.Q_conv)[:, : len(res.eigs)]
            lam = np.asarray(res.eigs)
            R = a @ Q - Q * lam[None, :]
            worst = float(np.max(np.linalg.norm(R, axis=0)) /
                          max(abs(lam).max(), 1e-300))

        out = dict(
            matrix=name, n=n, nnz=int(a.nnz),
            format=rec["format"], reordered=rec["reordered"],
            route_notes=rec["route_notes"], solver=rec["solver"],
            converged=rec["converged"], n_restarts=rec["n_restarts"],
            eig_rel_err_vs_eigsh=eig_err, cli_wall_s=round(wall, 1),
            audit_solver=res.solver, audit_converged=res.converged,
            audit_worst_rel_residual=worst,
        )
        recs.append(out)
        print(json.dumps(out), flush=True)

    with open(OUT, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
