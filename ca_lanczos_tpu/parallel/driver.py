"""Distributed CA-Lanczos driver: host control loop over jitted mesh steps.

The large-array state (Krylov basis blocks) lives row-sharded on the mesh;
per outer iteration exactly one jitted step (parallel.step) runs on
device, and the O(s^2) tridiagonal recovery (solvers._block) runs on host
from the replicated R factors — the same split the reference implies
(ca_lanczos.m:150-245) but with the block's communication collapsed to
one halo exchange + one all-gather + two psums.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ca_lanczos_tpu.config import Basis
from ca_lanczos_tpu.ops.spmv import DiaMatrix, EllMatrix
from ca_lanczos_tpu.solvers._block import block_T, extend_T, first_block_T
from ca_lanczos_tpu.solvers.ca_lanczos import monomial_basis_matrix
from ca_lanczos_tpu.parallel.dist_ell import DistEll
from ca_lanczos_tpu.parallel.distributed import DistDia
from ca_lanczos_tpu.parallel.step import dist_ca_block, dist_first_block, newton_coeffs


@dataclasses.dataclass
class DistCaLanczosResult:
    T: np.ndarray  # (s*t, s*t)
    Q_blocks: List[jax.Array]  # row-sharded basis blocks
    beta: np.ndarray
    n: int  # true (unpadded) dimension

    @property
    def Q(self) -> np.ndarray:
        """Gathered dense basis (host), unpadded rows, s*t columns.

        Stored blocks overlap by one column (each block's first column is
        the previous block's last), so drop it when concatenating.
        """
        cols = [np.asarray(self.Q_blocks[0])]
        for B in self.Q_blocks[1:]:
            cols.append(np.asarray(B[:, 1:]))
        Qfull = np.concatenate(cols, axis=1)
        return Qfull[: self.n, : self.T.shape[0]]


def dist_ca_lanczos(
    A,
    r,
    s: int,
    total_steps: int,
    mesh: Mesh,
    basis: Basis = Basis.MONOMIAL,
    Bk: Optional[np.ndarray] = None,
    qr_method: str = "tsqr",
) -> DistCaLanczosResult:
    """Row-sharded CA-Lanczos over ``mesh`` (local orthogonalization).

    Semantics mirror solvers.ca_lanczos with orth=LOCAL, except the block
    CGS always runs two passes (see parallel.dist_orth).  A may be a
    DiaMatrix (banded) or EllMatrix (general bounded-bandwidth sparsity);
    for the Newton basis pass a precomputed ``Bk`` (e.g. from
    solvers.ca_lanczos.build_basis_matrix on the host operator).
    """
    basis = Basis(basis)
    t = int(np.ceil(total_steps / s))
    if Bk is None:
        if basis != Basis.MONOMIAL:
            raise ValueError("newton basis requires an explicit Bk (bootstrap on host)")
        Bk = monomial_basis_matrix(s)
    diag_np, sub_np = newton_coeffs(Bk)

    if isinstance(A, EllMatrix):
        Adist = DistEll.from_ell(A, mesh, s_max=s)
    else:
        Adist = DistDia.from_dia(A, mesh, s_max=s)
    r = np.asarray(r)
    q = Adist.shard_vector(r / np.linalg.norm(r), mesh)
    dtype = q.dtype
    diag = jnp.asarray(diag_np, dtype)
    sub = jnp.asarray(sub_np, dtype)

    Q_blocks: List[jax.Array] = []
    b = np.zeros(t)
    T: Optional[np.ndarray] = None

    Qb, Rk = dist_first_block(Adist, q, diag, sub, s, mesh, qr_method)
    Q_blocks.append(Qb)
    T, b[0] = first_block_T(np.asarray(Rk, np.float64), Bk, s)

    for k in range(2, t + 1):
        Q_new, Rkk, R = dist_ca_block(Adist, Q_blocks[-1], diag, sub, s, mesh, qr_method)
        Tk, b[k - 1], _ = block_T(
            np.asarray(Rkk, np.float64), np.asarray(R, np.float64), Bk, b[k - 2], s
        )
        T = extend_T(T, Tk, b[k - 2], b[k - 1], s)
        # Store the next block's s+1 columns: previous end column + new s.
        Q_blocks.append(jnp.concatenate([Q_blocks[-1][:, -1:], Q_new], axis=1))

    return DistCaLanczosResult(T=T[: s * t, : s * t], Q_blocks=Q_blocks, beta=b, n=A.n)


def dist_lanczos(A: DiaMatrix, r, maxiter: int, mesh: Mesh):
    """Distributed standard Lanczos (baseline the CA drivers amortize:
    ONE halo exchange + global dot reductions PER STEP vs one per s
    steps, lanczos.m:85-134).  Local orthogonalization only; returns
    (T (maxiter, maxiter) host, Q (n, maxiter) sharded)."""
    from ca_lanczos_tpu.parallel.distributed import dist_spmv

    Adist = DistDia.from_dia(A, mesh, s_max=1)
    n_pad = Adist.n_shards * Adist.n_local
    r_np = np.asarray(r, np.float64)
    q = Adist.shard_vector(r_np / np.linalg.norm(r_np), mesh)
    dtype = q.dtype

    Q = jnp.zeros((n_pad, maxiter + 1), dtype)
    Q = Q.at[:, 0].set(q)
    alpha = np.zeros(maxiter)
    beta = np.zeros(maxiter)
    for j in range(1, maxiter + 1):
        w = dist_spmv(Adist, Q[:, j - 1], mesh)
        if j > 1:
            w = w - jnp.asarray(beta[j - 2], dtype) * Q[:, j - 2]
        a = float(jnp.vdot(Q[:, j - 1], w))  # GSPMD: local partials + psum
        w = w - a * Q[:, j - 1]
        b = float(jnp.linalg.norm(w))
        alpha[j - 1], beta[j - 1] = a, b
        Q = Q.at[:, j].set(w / b)

    T = np.diag(alpha)
    if maxiter > 1:
        T += np.diag(beta[: maxiter - 1], 1) + np.diag(beta[: maxiter - 1], -1)
    return T, Q[: A.n, :maxiter]
