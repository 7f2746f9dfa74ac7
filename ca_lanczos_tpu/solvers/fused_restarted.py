"""Fully-on-device restarted CA-Lanczos: the whole solve in ONE XLA call.

The host drivers (solvers.restarted) keep the restart state machine in
Python — per block they synchronize R factors, per cycle they eig the
small T.  Through the relay every synchronization costs ~30 ms, so a
1M-row f32 solve spent minutes in latency.  This driver moves EVERYTHING
under one jit:

* CA blocks with two-pass CGS + shifted CholQR2 (the TPU production
  orth), the Tk-from-R-factors recurrence (ca_lanczos.m:200-223) done in
  jnp small math;
* eigh of the cycle T on device;
* candidate verification by a single multivector SpMV (true residuals —
  the same catastrophic-lie guard as the host driver);
* fixed-shape Ritz locking: Qconv is padded to 2*n_wanted columns and
  candidates merge in via masked dynamic_update_slice, so no shape ever
  depends on the lock count;
* the cycle loop is a lax.while_loop on (nconv < n_wanted) & (cycle <
  max_restarts).

Semantics match dist_restarted_ca_lanczos with orth=LOCAL (always-2-pass
CGS; passing candidates locked in descending order with true-residual
verification).  Adaptive per-cycle diagnostics live on the host drivers.

Precision: float64 converges to reference accuracy (2e-13 in 3 cycles on
the gapped test spectrum); float32 locks eigenpairs down to its
verification floor and then honestly stops locking (partial nconv) —
use f64 for full eigenvector convergence, f32 for eigenvalue estimates.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ca_lanczos_tpu.config import Basis
from ca_lanczos_tpu.ops.qr import cholqr2
from ca_lanczos_tpu.ops.spmv import Operator, normest, spmv
from ca_lanczos_tpu.solvers.ca_lanczos import build_basis_matrix, monomial_basis_matrix


def _rdiv(X, Y):
    """X @ inv(Y) via a solve (small operands)."""
    return jnp.linalg.solve(Y.T, X.T).T


def _block_T_jnp(Rkk_s, Rk_s, Bk, b_prev, s):
    """Device mirror of solvers._block.block_T (ca_lanczos.m:200-214)."""
    Rkk = jnp.concatenate([jnp.zeros((s, 1), Rkk_s.dtype), Rkk_s[:s, :]], axis=1)
    Rk = jnp.zeros((s + 1, s + 1), Rk_s.dtype)
    Rk = Rk.at[0, 0].set(1.0)
    Rk = Rk.at[0, 1:].set(Rkk_s[s, :s])
    Rk = Rk.at[1:, 1:].set(Rk_s)
    zk = Rk[:s, s]
    rho = Rk[s, s]
    rho_t = Rk[s - 1, s - 1]
    bk = Bk[s, s - 1]
    Rs = Rk[:s, :s]
    es = jnp.zeros(s, Rk.dtype).at[s - 1].set(1.0)
    e1 = jnp.zeros(s, Rk.dtype).at[0].set(1.0)
    main = _rdiv(Rs @ Bk[:s, :], Rs)
    corr = (bk / rho_t) * jnp.outer(zk, es)
    last_row = _rdiv(Rkk[:s, :s][s - 1 : s, :], Rs)
    Tk = main + corr - b_prev * jnp.outer(e1, last_row[0])
    beta_k = bk * (rho / rho_t)
    return Tk, beta_k


@dataclasses.dataclass
class FusedRestartedResult:
    eigs: np.ndarray  # (n_wanted,) locked eigenvalues (NaN where unlocked)
    Q_conv: jax.Array  # (n, n_wanted)
    nconv: int
    n_restarts: int
    converged: bool


@partial(jax.jit, static_argnames=("s", "iters", "n_wanted", "max_restarts"))
def _fused_restarted(
    A: Operator,
    q0: jax.Array,
    Bk: jax.Array,  # (s+1, s)
    tol: jax.Array,
    lam_bound: jax.Array,
    s: int,
    iters: int,
    n_wanted: int,
    max_restarts: int,
):
    n = q0.shape[0]
    dtype = q0.dtype
    m = s * iters
    W2 = 2 * n_wanted

    def cycle_body(state):
        q, Qconv, eigs_acc, nconv, cycle = state

        # ---- inner CA blocks -------------------------------------------
        Tmat = jnp.zeros((m, m), dtype)
        betas = jnp.zeros(iters, dtype)
        Q_cycle = jnp.zeros((n, m), dtype)

        # powers through the generic recurrence driven by Bk columns
        diag = jnp.diagonal(Bk)[:s]
        sup = jnp.zeros(s, dtype)
        if s > 1:
            sup = sup.at[1:].set(jnp.diagonal(Bk, 1)[: s - 1])

        def powers(qv):
            def step(carry, coeffs):
                v_km1, v_k = carry
                d, sb = coeffs
                w = spmv(A, v_k) - d * v_k - sb * v_km1
                return (v_k, w), w

            zero = jnp.zeros_like(qv)
            _, ws = lax.scan(step, (zero, qv), (diag, sup))
            return jnp.concatenate([qv[None], ws], axis=0).T  # (n, s+1)

        # first block
        Vb = powers(q)
        Qb, Rk = cholqr2(Vb)
        # lock against Qconv (zero columns are no-ops), then re-normalize
        for _ in range(2):
            Qb = Qb - Qconv @ (Qconv.T @ Qb)
        Qb, _ = cholqr2(Qb)
        T1 = _rdiv(Rk @ Bk, Rk[:s, :s])
        Tmat = Tmat.at[:s, :s].set(T1[:s, :s])
        betas = betas.at[0].set(T1[s, s - 1])
        c0 = min(s + 1, m)
        Q_cycle = Q_cycle.at[:, :c0].set(Qb[:, :c0])
        Q_prev = Qb

        for k in range(2, iters + 1):
            Vb = powers(Q_prev[:, -1])
            X = Vb[:, 1:]
            Rkk = jnp.zeros((s + 1, s), dtype)
            for _ in range(2):
                Rp = Q_prev.T @ X
                X = X - Q_prev @ Rp
                Rkk = Rkk + Rp
            for _ in range(1):
                X = X - Qconv @ (Qconv.T @ X)
            Q_new, Rn = cholqr2(X)
            Tk, b_k = _block_T_jnp(Rkk, Rn, Bk, betas[k - 2], s)
            lo = (k - 1) * s
            Tmat = Tmat.at[lo : lo + s, lo : lo + s].set(Tk)
            Tmat = Tmat.at[lo, lo - 1].set(betas[k - 2])
            Tmat = Tmat.at[lo - 1, lo].set(betas[k - 2])
            betas = betas.at[k - 1].set(b_k)
            hi = min(lo + s + 1, m)
            Q_cycle = Q_cycle.at[:, lo + 1 : hi].set(Q_new[:, : hi - lo - 1])
            Q_prev = jnp.concatenate([Q_prev[:, -1:], Q_new], axis=1)

        # ---- Ritz extraction + verification ----------------------------
        Tsym = (Tmat + Tmat.T) / 2
        d, Vp = jnp.linalg.eigh(Tsym)  # ascending
        beta_m = betas[iters - 1]
        rn = beta_m * jnp.abs(Vp[m - 1, :])

        order = jnp.argsort(d)[::-1][:n_wanted]
        d_top = d[order]
        rn_top = rn[order]
        X_top = Q_cycle @ Vp[:, order]  # (n, n_wanted)

        # true residuals (multivector SpMV) — catastrophic-lie guard
        R_true = spmv(A, X_top) - X_top * d_top[None, :]
        true_abs = jnp.sqrt(jnp.sum(R_true * R_true, axis=0))

        passed = (rn_top < tol) & (true_abs < 0.01 * lam_bound) & (jnp.abs(d_top) <= 1.05 * lam_bound)
        # Compact ANY passing candidates to the front (stable: descending
        # eigenvalue order preserved within the passing group) — a prefix
        # rule would deadlock whenever the top candidate persistently
        # fails verification.
        perm = jnp.argsort(jnp.logical_not(passed), stable=True)
        d_p = d_top[perm]
        X_p = X_top[:, perm]
        npass = jnp.sum(passed.astype(jnp.int32)).astype(jnp.int32)
        avail = jnp.asarray(n_wanted, jnp.int32) - nconv
        k_new = jnp.minimum(npass, avail)
        lock = jnp.arange(n_wanted) < k_new

        # merge candidates into Qconv / eigs at column offset nconv
        zero_i = jnp.asarray(0, nconv.dtype)
        old_q = lax.dynamic_slice(Qconv, (zero_i, nconv), (n, n_wanted))
        upd_q = jnp.where(lock[None, :], X_p, old_q)
        Qconv = lax.dynamic_update_slice(Qconv, upd_q, (zero_i, nconv))
        old_e = lax.dynamic_slice(eigs_acc, (nconv,), (n_wanted,))
        upd_e = jnp.where(lock, d_p, old_e)
        eigs_acc = lax.dynamic_update_slice(eigs_acc, upd_e, (nconv,))
        nconv = (nconv + k_new).astype(jnp.int32)

        # restart vector: the largest candidate that did not lock
        idx = jnp.minimum(npass, n_wanted - 1).astype(jnp.int32)
        q_next = lax.dynamic_slice(X_p, (zero_i, idx), (n, 1))[:, 0]
        q_next = q_next / jnp.linalg.norm(q_next)

        return (q_next, Qconv, eigs_acc, nconv, cycle + 1)

    def cond(state):
        _, _, _, nconv, cycle = state
        return (nconv < n_wanted) & (cycle < max_restarts)

    Qconv0 = jnp.zeros((n, W2), dtype)
    eigs0 = jnp.full((W2,), jnp.nan, dtype)
    state = (q0, Qconv0, eigs0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    q, Qconv, eigs_acc, nconv, cycles = lax.while_loop(cond, cycle_body, state)
    return Qconv[:, :n_wanted], eigs_acc[:n_wanted], nconv, cycles


def fused_restarted_ca_lanczos(
    A: Operator,
    r,
    max_lanczos: int,
    n_wanted: int = 10,
    s: int = 8,
    basis: Basis = Basis.NEWTON,
    tol: float = 1.0e-8,
    max_restarts: int = 200,
) -> FusedRestartedResult:
    """One-XLA-call restarted CA-Lanczos (see module docstring).

    The Newton bootstrap (2s-step standard Lanczos + Leja ordering,
    restarted_ca_lanczos.m:61-71) stays on the host — it runs once.
    """
    basis = Basis(basis)
    norm_A = normest(A)
    r = jnp.asarray(r)
    q0 = r / jnp.linalg.norm(r)
    if basis == Basis.MONOMIAL:
        Bk = monomial_basis_matrix(s)
    else:
        Bk = build_basis_matrix(A, q0, s, basis)
    iters = max_lanczos // s
    if iters == 0:
        raise ValueError(f"max_lanczos={max_lanczos} < s={s}")

    Qc, eigs, nconv, cycles = _fused_restarted(
        A,
        q0,
        jnp.asarray(np.asarray(Bk, np.float64), q0.dtype),
        jnp.asarray(tol * norm_A, q0.dtype),
        jnp.asarray(norm_A, q0.dtype),
        s,
        iters,
        n_wanted,
        max_restarts,
    )
    nconv = int(nconv)
    return FusedRestartedResult(
        eigs=np.asarray(eigs),
        Q_conv=Qc,
        nconv=nconv,
        n_restarts=int(cycles),
        converged=nconv >= n_wanted,
    )
