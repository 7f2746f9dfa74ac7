"""Final f64-operator Rayleigh–Ritz polish of a converged block.

Round-3 found the north-star flagship's accuracy degrading with n
(5.6e-7 at 4.2M rows -> 2.3e-5 at 11M, results/flagship_10m.jsonl):
the in-solve refine keeps vectors AND the operator in f32, so the
polished values inherit (a) f32 SpMV rounding of the Rayleigh quotients
and (b) the f32 REPRESENTATION error of the matrix itself —
|lambda(A_f32) - lambda(A_f64)| <= ||dA|| ~ eps_f32 * ||A||, i.e. a
~6e-8 relative floor that no amount of f32-side iteration can cross.

This pass runs AFTER the solve as its own device call(s): it takes the
f64 operator planes (the host has them — only the solve's streaming
copy is f32) and the locked block, and runs block-Krylov Rayleigh–Ritz
(residual expansion of depth `depth` per pass — a single residual block
contracts only ~(width-gap)/(width+gap) per RR pass against a wide
bulk, measured ~0.76/iter on the north-star spectrum; the depth-d
Krylov applies the optimal degree-d polynomial instead).

PRECISION SPLIT (the TPU-shaped part): f64 dot_general on tall-skinny
panels runs ~500x below HBM bandwidth on this backend (measured 683 ms
for one (4.2M, 10) f64 Gram vs 8 ms for the f64 SpMV), so the panel
GEMMs — CGS projections, CholQR2, RR assembly — all run in f32 on the
MXU.  Float64 appears exactly where it buys accuracy:

* the SpMV against the TRUE f64 planes (cheap, bandwidth-bound);
* residual formation AQ - Q w in f64 before casting the DIRECTION to
  f32 (so the search direction is eps_f32-accurate relative to the
  residual, letting the subspace angle contract to the f32 storage
  floor instead of the eps_f32*||A||/gap residual floor);
* the final PER-VECTOR Rayleigh quotients and residuals, as f64
  elementwise dots (not GEMMs).  Rayleigh quotients are quadratic in
  the vector error, so f32-stored vectors at the ~1e-7 angle floor
  still give ~1e-12-grade values — the RR rotations only steer the
  subspace and need no f64.

Reference anchor: restarted_ca_lanczos.m:36-39 (tol = 1e-8 * normest);
BASELINE.md asks for 1e-10-grade Ritz parity at >=10M rows.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ca_lanczos_tpu.ops.qr import cholqr2
from ca_lanczos_tpu.ops.spmv import spmv


@partial(jax.jit, static_argnames=("k", "depth", "final"))
def _polish_pass(A, X, k: int, depth: int, final: bool = False):
    """One block-Krylov RR pass.  X: (n, k) any float dtype; returns
    (w (k,) f64 Rayleigh quotients, resid (k,) f64, Q (n, k) f32).

    final=True: the RR rotation itself runs off f64 GENERALIZED Gram
    matrices (G = Z^T A Z and M = Z^T Z both f64-accumulated, solved as
    G u = w M u via Cholesky of M).  The fast passes' f32 Gram carries
    ~sqrt(n)*eps_f32 accumulation error (~1e-4 at 4M rows), which
    re-injects that much subspace mixing per rotation — measured as a
    non-monotone ~5e-9 relative eigenvalue floor.  One f64-Gram
    rotation at the end removes it; the generalized form makes the
    f32-level non-orthonormality of the panels cancel to first order."""
    X = X.astype(jnp.float32)
    n = X.shape[0]
    m = depth + 1
    f32, f64 = jnp.float32, jnp.float64

    def unit_cols(B):
        return B / jnp.maximum(jnp.linalg.norm(B, axis=0), 1e-300)[None, :]

    def spmv64(Z):
        return spmv(A, Z.astype(f64))  # f64 planes -> f64 result

    def resid64(Q, w64):
        return spmv64(Q) - Q.astype(f64) * w64[None, :]

    def rq64(Q):
        """Per-vector f64 Rayleigh quotients (elementwise dots)."""
        AQ = spmv64(Q)
        Q64 = Q.astype(f64)
        num = jnp.einsum("ij,ij->j", Q64, AQ)
        den = jnp.einsum("ij,ij->j", Q64, Q64)
        return num / den

    Q, _ = cholqr2(X)
    w = rq64(Q)

    # Stage panels: S[0] = Q, S[d] = orthonormalized A^d-residual.
    S = jnp.zeros((m, n, k), f32).at[0].set(Q)
    B = unit_cols(resid64(Q, w).astype(f32))
    for d in range(depth):
        for _pass in range(2):  # CGS2 against previous stages (f32 MXU)
            def cgs(j, B):
                Sj = lax.dynamic_index_in_dim(S, j, keepdims=False)
                return B - Sj @ (Sj.T @ B)

            B = lax.fori_loop(0, d + 1, cgs, B)
        B, _ = cholqr2(unit_cols(B))
        S = S.at[d + 1].set(B)
        if d < depth - 1:
            B = unit_cols(spmv64(B).astype(f32))

    # RR over the joint basis: Gram panels in f32 for the fast passes
    # (rotation only — the VALUES come from per-vector f64 quotients
    # below); f64 generalized Gram for the final pass (docstring).
    if final:
        from ca_lanczos_tpu.ops.qr import gram_f64

        G = [[None] * m for _ in range(m)]
        M = [[None] * m for _ in range(m)]
        for j in range(m):
            Sj = S[j]
            ASj = spmv64(Sj)
            for i in range(m):
                # ASj stays f64: casting it to f32 rounds A S at
                # eps_f32*||A||, which would steer the rotation by
                # ~1e-5 — exactly the noise this pass removes.
                G[i][j] = gram_f64(S[i], ASj)
                M[i][j] = gram_f64(S[i], Sj)
        Gm = jnp.block(G)
        Mm = (jnp.block(M) + jnp.block(M).T) / 2
        L = jnp.linalg.cholesky(Mm)
        Gt = jax.scipy.linalg.solve_triangular(L, Gm, lower=True)
        Gt = jax.scipy.linalg.solve_triangular(L, Gt.T, lower=True)
        wa, Ut = jnp.linalg.eigh((Gt + Gt.T) / 2)
        Ua = jax.scipy.linalg.solve_triangular(L.T, Ut, lower=False)
    else:
        def gram_col(j, G):
            Sj = lax.dynamic_index_in_dim(S, j, keepdims=False)
            ASj = spmv64(Sj).astype(f32)

            def gram_row(i, G):
                Si = lax.dynamic_index_in_dim(S, i, keepdims=False)
                return lax.dynamic_update_slice(G, Si.T @ ASj, (i * k, j * k))

            return lax.fori_loop(0, m, gram_row, G)

        Gm = lax.fori_loop(0, m, gram_col, jnp.zeros((m * k, m * k), f32))
        Gm = Gm.astype(f64)
        wa, Ua = jnp.linalg.eigh((Gm + Gm.T) / 2)
    order = jnp.argsort(wa)[::-1][:k]
    Uk = Ua[:, order].astype(f32).reshape(m, k, k)

    def assemble(i, Q):
        Si = lax.dynamic_index_in_dim(S, i, keepdims=False)
        return Q + Si @ lax.dynamic_index_in_dim(Uk, i, keepdims=False)

    Q = lax.fori_loop(0, m, assemble, jnp.zeros((n, k), f32))
    Q, _ = cholqr2(Q)
    w = rq64(Q)
    resid = jnp.linalg.norm(resid64(Q, w), axis=0)
    return w, resid, Q


def rayleigh_ritz_polish(
    A64, X, iters: int = 3, depth: int = 4
) -> Tuple[np.ndarray, np.ndarray, jax.Array]:
    """Polish a locked block against the f64 operator.

    A64: the operator with FLOAT64 data planes (e.g. a DiaMatrix built
    from the host's f64 arrays — not the solve's f32 streaming copy).
    X: (n, k) converged block, any float dtype, natural row order.
    iters x depth: outer RR passes x residual block-Krylov depth per
    pass; each pass is its own device call (the axon relay kills
    long-running calls) with state device-resident in between.

    Returns (eigs desc (k,) f64, true absolute residuals ||Ax - wx||
    (k,) f64, polished orthonormal block (n, k) f32 device array).
    """
    if np.dtype(A64.dtype) != np.float64:
        raise ValueError(
            f"polish needs f64 operator planes, got {np.dtype(A64.dtype)}"
        )
    k = int(X.shape[1])
    Q = X
    w = resid = None
    total = max(int(iters), 1)
    for it in range(total):
        w, resid, Q = _polish_pass(
            A64, Q, k, int(depth), final=(it == total - 1)
        )
        jax.block_until_ready(Q)
    return np.asarray(w), np.asarray(resid), Q
