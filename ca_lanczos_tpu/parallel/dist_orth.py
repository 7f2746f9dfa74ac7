"""Distributed block orthogonalization: TSQR, CholQR, block CGS.

TPU-native replacements for the reference's tall-skinny QR layer
(tsqr.m:7-12, cholqr.m:3-9, project.m:32-39): the n-dimension is
row-sharded, all reductions are single XLA collectives:

* ``dist_tsqr`` — local thin QR per shard, ``all_gather`` of the P small
  R factors, replicated QR of the stacked (P*m, m) matrix, local Q
  correction.  One collective of P*m*m elements; the classic
  communication-optimal TSQR tree collapsed to one level (P is small on a
  pod slice, and XLA's all-gather is already a tree/ring on ICI).
* ``dist_cholqr`` — Gram matrix via ``psum``, replicated Cholesky, local
  triangular solve.  2x fewer flops than TSQR, half the stability (used
  exactly like cholqr.m: an alternative normalizer).
* ``dist_project`` — block classical Gram-Schmidt with ``psum``-reduced
  Gram products (the distributed form of project.m:32-39), fixed two
  passes (BCGS2) so the step stays branch-free under jit; the
  data-dependent single/double-pass choice of the host path
  (projectAndNormalize.m:43-57) is deliberately replaced by the
  always-double-pass variant, which is what a fixed-shape TPU step wants
  and is at least as accurate.

All functions run INSIDE ``shard_map`` (they operate on local shards and
use ``psum``/``all_gather`` over the ``'rows'`` axis); compose them into a
jitted step with ``jax.shard_map`` — see ``parallel.step``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ca_lanczos_tpu.parallel.mesh import ROWS


def local_tsqr(X_local: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """TSQR across the rows axis: X_local (n_local, m) -> (Q_local, R).

    R is replicated and has a non-negative diagonal (sign-fix parity with
    tsqr.m:9-11).  Call inside shard_map.
    """
    m = X_local.shape[1]
    Q1, R1 = jnp.linalg.qr(X_local, mode="reduced")  # (n_local, m), (m, m)
    # Gather the P local R factors by slot-placement + psum (equivalent to
    # all_gather but statically replicated, so the result feeds replicated
    # small math without VMA casts).
    P_ = lax.axis_size(ROWS)
    idx = lax.axis_index(ROWS)
    stacked = jnp.zeros((P_ * m, m), R1.dtype)
    stacked = lax.dynamic_update_slice_in_dim(stacked, R1, idx * m, axis=0)
    stacked = lax.psum(stacked, ROWS)
    Q2, R = jnp.linalg.qr(stacked, mode="reduced")
    # Sign fix: diag(R) >= 0.
    sgn = jnp.where(jnp.diag(R) < 0, -1.0, 1.0).astype(R.dtype)
    R = sgn[:, None] * R
    Q2 = Q2 * sgn[None, :]
    idx = lax.axis_index(ROWS)
    Q2_mine = lax.dynamic_slice_in_dim(Q2, idx * m, m, axis=0)
    return Q1 @ Q2_mine, R


def local_cholqr(
    X_local: jax.Array, mp: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """CholQR across the rows axis (cholqr.m:3-9): G = psum(X^T X),
    R = chol(G), Q = X R^{-1}.  Call inside shard_map.

    mp: accumulate the Gram psum, Cholesky, and triangular solve in
    float64 while X (and the returned Q) stay in the storage dtype —
    the distributed form of ops.qr.cholqr_mp (OrthParams.
    mixed_precision).  The f64 Gram is the accuracy lever: the psum'd
    X^T X in f32 loses ~2^-24 relative, the f32 flagship's hardware
    eigenvalue-error floor.  R returns float64 so the host T recovery
    keeps full precision."""
    from ca_lanczos_tpu.ops.qr import _chol_safe

    if mp and X_local.dtype != jnp.float64:
        Xw = X_local.astype(jnp.float64)
        G = lax.psum(Xw.T @ Xw, ROWS)
        R = _chol_safe(G).conj().T
        Q = lax.linalg.triangular_solve(
            R, Xw, left_side=False, lower=False
        ).astype(X_local.dtype)
        return Q, R
    G = lax.psum(X_local.T @ X_local, ROWS)
    R = _chol_safe(G).conj().T
    Q = lax.linalg.triangular_solve(R, X_local, left_side=False, lower=False)
    return Q, R


def local_cholqr2(
    X_local: jax.Array, mp: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Two distributed CholQR passes — the TPU-production normalizer
    (XLA's Householder QR of tall-skinny shards is minutes-slow on TPU;
    see config.QrMethod).  Valid for cond(X) < ~eps^{-1/2}."""
    Q1, R1 = local_cholqr(X_local, mp)
    Q2, R2 = local_cholqr(Q1, mp)
    return Q2, R2 @ R1


def local_tsqr_mp(X_local: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """local_tsqr with the factorization in float64; Q returns in X's
    dtype, R stays float64 (distributed ops.qr.tsqr_mp)."""
    Q, R = local_tsqr(X_local.astype(jnp.float64))
    return Q.astype(X_local.dtype), R


def local_qr(X_local: jax.Array, qr_method: str = "tsqr", mp: bool = False):
    """Dispatch on config.QrMethod value (+ OrthParams.mixed_precision)."""
    from ca_lanczos_tpu.config import QrMethod

    mp = mp and X_local.dtype != jnp.float64
    if QrMethod(qr_method) == QrMethod.CHOLQR2:
        return local_cholqr2(X_local, mp)
    return local_tsqr_mp(X_local) if mp else local_tsqr(X_local)


def local_qr_safe(
    X_local: jax.Array,
    qr_method: str = "tsqr",
    key: jax.Array = None,
    rank_tol: float = 1.0e-12,
    mp: bool = False,
):
    """Rank-revealing local_qr with masked fixed-shape null-space
    randomization — the in-jit distributed form of the reference's
    ``randomizeNullSpace`` (normalize.m:28-51).

    Deficient directions (sigma_i <= rank_tol * sigma_1; the reference
    uses 1e-8 at normalize.m:17-24, but a monomial powers block is
    legitimately 1e-8-conditioned, so true-breakdown detection here sits
    near roundoff instead) are counted into the returned ``rank``; the
    RANDOMIZED basis refresh fires only on CATASTROPHIC breakdown
    (rank <= 1, i.e. the start vector was an invariant direction).
    Merely ill-conditioned blocks — a restart from a nearly-converged
    Ritz vector makes sigma_min/sigma_1 ~ (residual * basis condition),
    down to 1e-13..1e-15 — pass through unrefreshed: Householder QR
    keeps range(X) in the leading columns and the pinv T recovery
    regularizes the small solves, whereas a wholesale refresh would
    destroy the Q/R pairing and wipe the cycle's refinement (observed
    as a convergence stall at ~1e-5 residuals).
    Returns (Q, R, rank).
    """
    m = X_local.shape[1]
    # mp composes: the factorization R (the T-recovery input) keeps its
    # f64 Gram accumulation in safe mode too; the refresh path below is
    # randomization plumbing and stays in storage dtype.
    Q, R = local_qr(X_local, qr_method, mp)
    # Numerical rank via SVD of the small replicated R, exactly like the
    # reference (normalize.m:14-24): singular DIRECTIONS, not columns —
    # an unpivoted QR can leak range components into its garbage columns,
    # so diagonal-of-R tests would lose part of range(X).
    U, S, _ = jnp.linalg.svd(R)
    bad = S <= rank_tol * S[0]  # replicated; sorted, so bad is a suffix
    rank = m - jnp.sum(bad)

    idx = lax.axis_index(ROWS)
    k = jax.random.fold_in(key, idx)
    rnd = jax.random.normal(k, X_local.shape, X_local.dtype)
    # keep the refresh path in storage dtype (mp leaves R f64)
    Qrot = Q @ U.astype(Q.dtype)  # leading `rank` cols span range(X)
    Qgood = jnp.where(bad[None, :], 0.0, Qrot)
    Y = jnp.where(bad[None, :], rnd, Qrot)
    for _ in range(2):  # masked CGS: only the replaced columns move
        G = local_gram(Qgood, Y)
        Y = jnp.where(bad[None, :], Y - Qgood @ G, Y)
    Q2, _ = local_qr(Y, qr_method)
    # Left-to-right QR keeps the (already orthonormal) surviving columns
    # and completes the replaced ones against them.  On breakdown the
    # returned Q no longer pairs columnwise with R (the basis has been
    # refreshed); R is returned unchanged so callers can regularize their
    # small solves, exactly as with the reference's randomizeNullSpace.
    severe = rank <= 1  # catastrophic only — see docstring
    Q_out = jnp.where(severe, Q2, Q)
    return Q_out, R, rank


def local_gram(
    Q_local: jax.Array, X_local: jax.Array, mp: bool = False
) -> jax.Array:
    """Replicated Gram product R = Q^H X via psum.  Call inside
    shard_map.  mp: accumulate in float64 (returns float64)."""
    if mp and X_local.dtype != jnp.float64:
        return lax.psum(
            Q_local.astype(jnp.float64).conj().T
            @ X_local.astype(jnp.float64),
            ROWS,
        )
    return lax.psum(Q_local.conj().T @ X_local, ROWS)


def local_project(
    Q_local: jax.Array, X_local: jax.Array, passes: int = 2, mp: bool = False
):
    """Block CGS of X against orthonormal Q with ``passes`` fixed passes
    (distributed project.m:32-39 with the BCGS2 second pass made
    unconditional).  Returns (Y_local, R accumulated).

    mp: Gram products and corrections in float64 (distributed
    ops.orth._proj_block_mp); Y returns in X's dtype, R in float64."""
    mp = mp and X_local.dtype != jnp.float64
    rdtype = jnp.float64 if mp else X_local.dtype
    R = jnp.zeros((Q_local.shape[1], X_local.shape[1]), rdtype)
    Y = X_local
    for _ in range(passes):
        Rp = local_gram(Q_local, Y, mp)
        if mp:
            Y = (
                Y.astype(jnp.float64) - Q_local.astype(jnp.float64) @ Rp
            ).astype(X_local.dtype)
        else:
            Y = Y - Q_local @ Rp
        R = R + Rp
    return Y, R


def local_norm(x_local: jax.Array) -> jax.Array:
    """Global 2-norm of a row-sharded vector/multivector (per column)."""
    return jnp.sqrt(lax.psum(jnp.sum(jnp.abs(x_local) ** 2, axis=0), ROWS))
