"""Implicitly-restarted (CA-)Lanczos with exact-shift QR steps.

Reference: impl_restarted_ca_lanczos.m (Sorensen-style IRL; qrstep at
:623-678 is the D.C. Sorensen 2000 bulge chase).  The reference file is
partially finished: its active path uses the standard inner iteration
with the CA inner commented out (:87-94), deflation is disabled
(:116-152), the shift loop references ``mu(j)`` where shifts live in
``u`` (:97,:103), and the per-restart coupling overwrites the true
beta_k with 1 (std_lanczos_basic :291-295 with a normalized q).  Per
SURVEY.md, this module implements the *intended* design:

* Krylov factorization A V_m = V_m T_m + r e_m^T extended from k to
  m = k + p columns by either the standard three-term recurrence or the
  CA matrix-powers inner iteration (selectable);
* the p unwanted Ritz values applied as exact single shifts via QR
  bulge-chase sweeps (qrstep semantics, all-real for symmetric A);
* the Arnoldi-style residual update
  r+ = V_m Q e_{k+1} T+(k+1,k) + r Q(m,k) (:110-114);
* convergence of the k-window Ritz pairs via beta_k |y_i(k)| < tol
  with tol = 1e-6 * normest(A) (:37-41).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu.config import Basis, Orth
from ca_lanczos_tpu.ops.matrix_powers import matrix_powers
from ca_lanczos_tpu.ops.orth import project, project_and_normalize
from ca_lanczos_tpu.ops.spmv import Operator, normest, spmv
from ca_lanczos_tpu.solvers._block import block_T
from ca_lanczos_tpu.solvers.ca_lanczos import build_basis_matrix


def qrstep(V: np.ndarray, H: np.ndarray, mu: complex, k1: int, k2: int):
    """One implicit QR restart step (impl_restarted_ca_lanczos.m:623-678).

    0-based window [k1, k2); applies a single real shift or a double
    complex-conjugate shift to the Hessenberg H, accumulating the
    orthogonal transform into V.  Rounding noise below the first
    subdiagonal is zeroed (:673-675).
    """
    kr = slice(k1, k2)
    k = k2 - k1
    eta = np.imag(mu)
    if abs(eta) > 0:
        xi = np.real(mu)
        M = (H[kr, kr] - xi * np.eye(k)) @ (H[kr, kr] - xi * np.eye(k)) + eta**2 * np.eye(k)
        Q, _ = np.linalg.qr(M)
    else:
        Q, _ = np.linalg.qr(H[kr, kr] - np.real(mu) * np.eye(k))
    H[kr, :] = Q.T @ H[kr, :]
    H[:, kr] = H[:, kr] @ Q
    V[:, kr] = V[:, kr] @ Q
    m = H.shape[0]
    for j in range(k1, k2):
        if j + 2 < m:
            H[j + 2 :, j] = 0.0
    return V, H


@dataclasses.dataclass
class IRLResult:
    eigs: np.ndarray
    Q_conv: Optional[jax.Array]
    n_restarts: int
    conv_rnorms: np.ndarray
    converged: bool


def _std_extend(
    A: Operator,
    V: jax.Array,
    T: np.ndarray,
    k0: int,
    m: int,
    orth: Orth,
) -> Tuple[jax.Array, np.ndarray, float]:
    """Extend A V_k = V_k T_k + beta_k v_{k+1} e_k^T to m columns with the
    standard recurrence (std_lanczos_basic :273-331, with the coupling
    beta_k preserved rather than overwritten by 1).

    V holds k0+1 columns (the +1 is the normalized residual direction);
    returns (V (n, m+1), T ((m+1), m) extended, beta_m)."""
    from ca_lanczos_tpu.config import OrthParams

    bcgs2 = OrthParams(reference_second_pass=False)
    dtype = V.dtype
    beta_prev = T[k0, k0 - 1] if k0 > 0 else 0.0
    for j in range(k0, m):
        r = spmv(A, V[:, j])
        if j > 0:
            r = r - jnp.asarray(beta_prev, dtype) * V[:, j - 1]
        alpha = float(np.real(jnp.vdot(V[:, j], r)))
        r = r - alpha * V[:, j]
        if orth == Orth.FULL:
            # Cleanup pass against the whole basis with the conventional
            # BCGS2 trigger — the IRL restart compresses the basis, so
            # orthogonality must stay at machine level for the bulge
            # chase to remain a similarity on the factorization.
            r, _ = project([V[:, : j + 1]], r, reorth=True, params=bcgs2)
        beta = float(jnp.linalg.norm(r))
        T[j, j] = alpha
        T[j + 1, j] = beta
        if j + 1 < T.shape[1]:
            T[j, j + 1] = beta
        V = V.at[:, j + 1].set(r / beta)
        beta_prev = beta
    return V, T, float(T[m, m - 1])


def _ca_extend(
    A: Operator,
    V: jax.Array,
    T: np.ndarray,
    k0: int,
    m: int,
    s: int,
    Bk: np.ndarray,
    basis: Basis,
    orth: Orth,
) -> Tuple[jax.Array, np.ndarray, float]:
    """CA inner iteration (the commented-out intended path,
    impl_restarted_ca_lanczos.m:87,92 -> lanczos_basic :332-426): extend
    by (m - k0) / s matrix-powers blocks, orthogonalizing each against the
    trailing s+1 columns (plus the full history for orth=full)."""
    assert (m - k0) % s == 0
    b_prev = T[k0, k0 - 1] if k0 > 0 else 0.0
    nvecs = k0
    while nvecs <= m - s:
        q = V[:, nvecs]
        Vp = matrix_powers(A, q, s, Bk, basis)
        if nvecs == 0:
            from ca_lanczos_tpu.ops.orth import normalize
            from ca_lanczos_tpu.solvers._block import first_block_T

            Qb, Rk, _ = normalize(Vp)
            V = V.at[:, : s + 1].set(Qb)
            Tk, b_new = first_block_T(Rk, Bk, s)
            T[: s + 1, :s] = Tk
            b_prev = b_new
        else:
            blocks = [V[:, nvecs - s : nvecs + 1]]
            if orth == Orth.FULL and nvecs > s:
                blocks = [V[:, : nvecs - s]] + blocks
            res = project_and_normalize(blocks, Vp[:, 1 : s + 1], reorth=False)
            V = V.at[:, nvecs + 1 : nvecs + s + 1].set(res.Q)
            Rkk_s = res.R_blocks[-1]
            Tk, b_new, _ = block_T(Rkk_s, res.R, Bk, b_prev, s)
            T[nvecs : nvecs + s, nvecs : nvecs + s] = Tk
            T[nvecs, nvecs - 1] = b_prev
            T[nvecs - 1, nvecs] = b_prev
            T[nvecs + s, nvecs + s - 1] = b_new
            if nvecs + s < T.shape[1]:
                T[nvecs + s - 1, nvecs + s] = 0.0
            b_prev = b_new
        nvecs += s
    return V, T, float(T[m, m - 1])


def impl_restarted_ca_lanczos(
    A: Operator,
    r: jax.Array,
    max_lanczos: int,
    n_wanted: int = 10,
    s: int = 6,
    basis: Basis = Basis.NEWTON,
    orth: Orth = Orth.LOCAL,
    tol: float = 1.0e-6,
    max_restarts: int = 40,
    inner: str = "ca",
) -> IRLResult:
    """Implicitly-restarted CA-Lanczos (impl_restarted_ca_lanczos.m:4-228).

    k = n_wanted + 4 retained directions per restart (:74); p unwanted
    Ritz values applied as exact shifts; ``inner`` in {"ca", "std"} picks
    the expansion iteration.
    """
    basis = Basis(basis)
    orth = Orth(orth)
    norm_A = normest(A)
    tol = tol * norm_A

    n = r.shape[0]
    q = r / jnp.linalg.norm(r)
    dtype = q.dtype

    k = n_wanted + 4
    p = s * ((max_lanczos - k) // s)
    m = k + p
    if p <= 0:
        raise ValueError(f"max_lanczos={max_lanczos} too small for k={k} + s={s}")
    if inner == "ca" and k % s != 0:
        # CA blocks must tile the restart window (:68-72 warns; we round
        # k up to the next multiple of s instead of bailing).
        k = s * (-(-k // s))
        p = s * ((max_lanczos - k) // s)
        m = k + p
        if p <= 0:
            raise ValueError("max_lanczos too small after rounding k to a multiple of s")

    Bk = build_basis_matrix(A, q, s, basis, bootstrap_orth=Orth.FULL)

    V = jnp.zeros((n, m + 1), dtype).at[:, 0].set(q)
    T = np.zeros((m + 1, m))

    n_restarts = 0
    converged = False
    nconv = 0
    while n_restarts < max_restarts:
        n_restarts += 1
        k0 = 0 if n_restarts == 1 else k
        if inner == "ca":
            V, T, beta_m = _ca_extend(A, V, T, k0, m, s, Bk, basis, orth)
        else:
            V, T, beta_m = _std_extend(A, V, T, k0, m, orth)

        # Shift selection (:97, selectShifts :246-253): unwanted = the
        # p smallest Ritz values of T_m (wanted strategy 'largest').
        Tm = T[:m, :m].copy()
        theta = np.linalg.eigvalsh((Tm + Tm.T) / 2)  # ascending
        shifts = theta[:p]

        # Residual vector before restart.
        r_vec = beta_m * V[:, m]

        # Bulge-chase sweep: apply each unwanted Ritz value (:99-108).
        Q = np.eye(m)
        H = Tm
        for mu in shifts:
            Q, H = qrstep(Q, H, mu, 0, m)

        # Truncate to k (:110-114).
        Vk_new = V[:, :m] @ jnp.asarray(Q[:, :k], dtype)
        r_new = (
            V[:, :m] @ jnp.asarray(Q[:, k] * H[k, k - 1], dtype)
            + r_vec * Q[m - 1, k - 1]
        )
        beta_k = float(jnp.linalg.norm(r_new))

        T = np.zeros((m + 1, m))
        T[:k, :k] = H[:k, :k]
        T[k, k - 1] = beta_k
        # Symmetric coupling into the next extension column: v_{k-1}^T A v_k
        # = beta_k (the std extension reads it from the T it is handed).
        T[k - 1, k] = beta_k
        V = jnp.zeros((n, m + 1), dtype)
        V = V.at[:, :k].set(Vk_new)
        V = V.at[:, k].set(r_new / beta_k)

        # Convergence of the k-window Ritz pairs (:128-147).
        Tk_sym = (T[:k, :k] + T[:k, :k].T) / 2
        d, Y = np.linalg.eigh(Tk_sym)
        rnorms = beta_k * np.abs(Y[k - 1, :])
        conv = rnorms < tol
        # Count converged among the n_wanted largest.
        order = np.argsort(d)[::-1][:n_wanted]
        nconv = int(np.sum(conv[order]))
        if nconv >= n_wanted:
            converged = True
            break

    # Final Ritz extraction from the k window (:216-221).
    Tk_sym = (T[:k, :k] + T[:k, :k].T) / 2
    d, Y = np.linalg.eigh(Tk_sym)
    order = np.argsort(d)[::-1][:n_wanted]
    eigs = d[order]
    rnorms = (float(T[k, k - 1]) * np.abs(Y[k - 1, :]))[order]
    Q_conv = V[:, :k] @ jnp.asarray(Y[:, order], dtype)
    return IRLResult(
        eigs=eigs,
        Q_conv=Q_conv,
        n_restarts=n_restarts,
        conv_rnorms=rnorms,
        converged=converged,
    )
