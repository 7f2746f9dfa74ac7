"""Tall-skinny QR factorizations (L1 layer).

* ``tsqr`` — thin QR with the sign convention diag(R) >= 0
  (reference: tsqr.m:7-12).  Single-device version; the distributed
  TSQR (local QR + gathered R-stack reduction) lives in
  ``ca_lanczos_tpu.parallel``.
* ``cholqr`` — Cholesky QR (reference: cholqr.m:3-9).  One Gram matmul +
  replicated small Cholesky + triangular solve; the cheapest
  communication pattern on a mesh and the fastest single-chip path when
  the block is well-conditioned.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sign_fix(Q: jax.Array, R: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Flip signs so diag(R) >= 0 (tsqr.m:9-11); sign(0) treated as +1."""
    d = jnp.sign(jnp.real(jnp.diagonal(R)))
    d = jnp.where(d == 0, 1.0, d).astype(R.dtype)
    return Q * d[None, :], R * d[:, None]


@jax.jit
def tsqr(X: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Thin QR of X (n, m), n >= m, with diag(R) >= 0."""
    with jax.named_scope("tsqr"):
        Q, R = jnp.linalg.qr(X, mode="reduced")
        return _sign_fix(Q, R)


@jax.jit
def cholqr(X: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Cholesky QR: G = X^H X, R = chol(G) (upper), Q = X R^{-1}."""
    G = X.conj().T @ X
    L = jnp.linalg.cholesky(G)  # lower
    R = L.conj().T
    # Q = X R^{-1}  <=>  R^T Q^T = X^T (no conjugation: (QR)^T = R^T Q^T)
    Qt = jax.scipy.linalg.solve_triangular(R.T, X.T, lower=True)
    return Qt.T, R


@jax.jit
def cholqr2(X: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """CholQR2: two passes of Cholesky QR for improved orthogonality.

    Not in the reference; provided as the high-throughput TPU
    orthogonalizer (Gram matmuls ride the MXU, no Householder
    sequential dependency).
    """
    Q1, R1 = cholqr(X)
    Q2, R2 = cholqr(Q1)
    return Q2, R2 @ R1
