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

from ca_lanczos_tpu.ops.spmv import DiaMatrix, spmv


def _spmv64_rm(A, Z):
    """A @ rows(Z): row-major (k, n) panel through the f64 operator.
    DIA: chunked along the row axis with bandwidth halos (one small f64
    chunk live); other operators: one row at a time through matvec."""
    from ca_lanczos_tpu.ops.qr import _mp_chunk_shape

    k, n = Z.shape
    if isinstance(A, DiaMatrix):
        ck = _mp_chunk_shape(n)
        offsets = A.offsets
        w = max((abs(o) for o in offsets), default=0)
        if ck is None:
            Z64 = Z.astype(jnp.float64)
            Zp = jnp.pad(Z64, ((0, 0), (w, w)))
            y = jnp.zeros((k, n), jnp.float64)
            for j, o in enumerate(offsets):
                y = y + A.data[j][None, :] * lax.dynamic_slice(
                    Zp, (0, w + o), (k, n))
            return y
        c, L = ck
        Zp = jnp.pad(Z, ((0, 0), (w, w)))
        Dp = jnp.pad(A.data, ((0, 0), (w, w)))

        def body(i, out):
            lo = i * L
            zc = lax.dynamic_slice(Zp, (0, lo), (k, L + 2 * w)).astype(jnp.float64)
            dc = lax.dynamic_slice(Dp, (0, lo), (A.data.shape[0], L + 2 * w))
            y = jnp.zeros((k, L), jnp.float64)
            for j, o in enumerate(offsets):
                y = y + dc[j, w : w + L][None, :] * lax.dynamic_slice(
                    zc, (0, w + o), (k, L))
            return lax.dynamic_update_slice(out, y, (0, lo))

        return lax.fori_loop(0, c, body, jnp.zeros((k, n), jnp.float64))

    def row(j, out):
        zj = lax.dynamic_slice(Z, (j, 0), (1, n))[0]
        yj = spmv(A, zj.astype(jnp.float64))
        return lax.dynamic_update_slice(out, yj[None, :], (j, 0))

    return lax.fori_loop(0, k, row, jnp.zeros((k, n), jnp.float64))


def _spmv32_rm(A32, Z):
    """A32 @ rows(Z), all-f32 row-major.  DIA gets the direct shifted
    form; other operators go row-by-row through matvec (a blocked (n, k)
    matvec would materialize a lane-padded column-major panel)."""
    k, n = Z.shape
    if isinstance(A32, DiaMatrix):
        offsets = A32.offsets
        w = max((abs(o) for o in offsets), default=0)
        Zp = jnp.pad(Z, ((0, 0), (w, w)))
        y = jnp.zeros((k, n), jnp.float32)
        for j, o in enumerate(offsets):
            y = y + A32.data[j][None, :] * lax.dynamic_slice(
                Zp, (0, w + o), (k, n))
        return y

    def row(j, out):
        zj = lax.dynamic_slice(Z, (j, 0), (1, n))[0]
        return lax.dynamic_update_slice(out, spmv(A32, zj)[None, :], (j, 0))

    return lax.fori_loop(0, k, row, jnp.zeros((k, n), jnp.float32))


def _gram64_rm(X, Y):
    """X Y^T accumulated in f64, column-chunked scan over row-major
    (k, n) panels — one small f64 chunk pair live."""
    from ca_lanczos_tpu.ops.qr import _mp_chunk_shape

    ck = _mp_chunk_shape(X.shape[1])
    if ck is None:
        return X.astype(jnp.float64) @ Y.astype(jnp.float64).T
    c, L = ck
    Xr = X.reshape(X.shape[0], c, L)
    Yr = Y.reshape(Y.shape[0], c, L)

    def body(i, acc):
        xc = lax.dynamic_index_in_dim(Xr, i, axis=1, keepdims=False)
        yc = lax.dynamic_index_in_dim(Yr, i, axis=1, keepdims=False)
        return acc + xc.astype(jnp.float64) @ yc.astype(jnp.float64).T

    z = jnp.zeros((X.shape[0], Y.shape[0]), jnp.float64)
    return lax.fori_loop(0, c, body, z)


@partial(jax.jit, static_argnames=("k", "depth", "final"))
def _polish_pass(A, A32, X, k: int, depth: int, final: bool = False):
    """One block-Krylov RR pass.  X: (k, n) ROW-MAJOR f32; returns
    (w (k,) f64 Rayleigh quotients, resid (k,) f64, Q (k, n) f32).

    ROW-MAJOR LAYOUT (the memory fix): TPU tiles pad the minor
    dimension to 128 lanes, so a column-major (11M, 10) panel occupies
    5.6 GB on device — the compile-time plan hit a constant ~16 GB for
    any formulation holding three panels.  (k, n) panels put the long
    axis on lanes ((16, 11M) after sublane padding = 0.7 GB) and all
    Grams/projections/CholQR flip to row-contractions on the MXU.

    final=True: the RR rotation itself runs off f64 GENERALIZED Gram
    matrices (G = Z^T A Z and M = Z^T Z both f64-accumulated, solved as
    G u = w M u via Cholesky of M).  The fast passes' f32 Gram carries
    ~sqrt(n)*eps_f32 accumulation error (~1e-4 at 4M rows), which
    re-injects that much subspace mixing per rotation — measured as a
    non-monotone ~5e-9 relative eigenvalue floor.  One f64-Gram
    rotation at the end removes it; the generalized form makes the
    f32-level non-orthonormality of the panels cancel to first order."""
    X = X.astype(jnp.float32)
    m = depth + 1
    f32, f64 = jnp.float32, jnp.float64

    def unit_rows(B):
        return B / jnp.maximum(
            jnp.linalg.norm(B, axis=1), 1e-300)[:, None]

    def cholqr2_rm(Z):
        from ca_lanczos_tpu.ops.qr import _chol_safe

        for _ in range(2):
            G = Z @ Z.T
            L = _chol_safe(G)
            Z = jax.scipy.linalg.solve_triangular(L, Z, lower=True)
        return Z

    def spmv64(Z):
        return _spmv64_rm(A, Z)  # f64 planes -> f64 result

    def resid64(Q, w64):
        return spmv64(Q) - w64[:, None] * Q.astype(f64)

    def rq64(Q):
        """Per-vector f64 Rayleigh quotients (elementwise dots)."""
        AQ = spmv64(Q)
        Q64 = Q.astype(f64)
        num = jnp.einsum("in,in->i", Q64, AQ)
        den = jnp.einsum("in,in->i", Q64, Q64)
        return num / den

    def pin(*arrs):
        """optimization_barrier: force program ORDER between phases so
        XLA cannot co-schedule panel temporaries across them."""
        return lax.optimization_barrier(tuple(arrs))

    Q = cholqr2_rm(X)
    w = rq64(Q)

    stages = [Q]
    B = unit_rows(resid64(Q, w).astype(f32))
    for d in range(depth):
        for _pass in range(2):  # CGS2 against previous stages (f32 MXU)
            for Sx in stages:
                B = B - (B @ Sx.T) @ Sx
        B = cholqr2_rm(unit_rows(B))
        stages.append(B)
        if d < depth - 1:
            # Krylov expansion stages ride the f32 twin: only the FIRST
            # residual direction is cancellation-sensitive (f64 above).
            B = unit_rows(_spmv32_rm(A32, B))
        pinned = pin(B, *stages)
        B, stages = pinned[0], list(pinned[1:])

    # RR over the joint basis: Gram panels in f32 for the fast passes
    # (rotation only — the VALUES come from per-vector f64 quotients
    # below); f64 generalized Gram for the final pass (docstring).
    G = [[None] * m for _ in range(m)]
    M = [[None] * m for _ in range(m)] if final else None
    for j in range(m):
        if final:
            # ASj stays f64: casting it to f32 rounds A S at
            # eps_f32*||A||, which would steer the rotation by ~1e-5 —
            # exactly the noise this pass removes.
            ASj = spmv64(stages[j])
            for i in range(m):
                G[i][j] = _gram64_rm(stages[i], ASj)
                M[i][j] = _gram64_rm(stages[i], stages[j])
        else:
            ASj = _spmv32_rm(A32, stages[j])
            for i in range(m):
                G[i][j] = (stages[i] @ ASj.T).astype(f64)
        small = [g for row_ in G for g in row_ if g is not None]
        if final:
            small += [g for row_ in M for g in row_ if g is not None]
        pinned = pin(*small, *stages)
        stages = list(pinned[len(small):])

    if final:
        Gm = jnp.block(G)
        Mm = jnp.block(M)
        Mm = (Mm + Mm.T) / 2
        L = jnp.linalg.cholesky(Mm)
        Gt = jax.scipy.linalg.solve_triangular(L, Gm, lower=True)
        Gt = jax.scipy.linalg.solve_triangular(L, Gt.T, lower=True)
        wa, Ut = jnp.linalg.eigh((Gt + Gt.T) / 2)
        Ua = jax.scipy.linalg.solve_triangular(L.T, Ut, lower=False)
    else:
        Gm = jnp.block(G)
        wa, Ua = jnp.linalg.eigh((Gm + Gm.T) / 2)
    order = jnp.argsort(wa)[::-1][:k]
    Uk = Ua[:, order].astype(f32)
    Q = sum(Uk[i * k : (i + 1) * k].T @ stages[i] for i in range(m))
    Q = cholqr2_rm(Q)
    w = rq64(Q)
    resid = jnp.linalg.norm(resid64(Q, w), axis=1)
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
    # f32 twin for the non-cancellation-sensitive applies (Krylov
    # expansion stages, fast-pass Grams).
    A32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64
        else x,
        A64,
    )
    # Internal state is ROW-MAJOR (k, n) — see _polish_pass docstring;
    # one transpose in, one out.
    Q = jnp.asarray(X).T
    w = resid = None
    total = max(int(iters), 1)
    for it in range(total):
        w, resid, Q = _polish_pass(
            A64, A32, Q, k, int(depth), final=(it == total - 1)
        )
        jax.block_until_ready(Q)
    return np.asarray(w), np.asarray(resid), Q.T
