"""Implicitly-restarted Lanczos and Arnoldi tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu.config import Basis, Orth
from ca_lanczos_tpu.solvers.arnoldi import arnoldi
from ca_lanczos_tpu.solvers.implicitly_restarted import impl_restarted_ca_lanczos, qrstep
from ca_lanczos_tpu.utils.matrices import diag_spectrum, laplacian_1d


class TestQrstep:
    def test_preserves_spectrum_and_deflates_shift(self):
        rng = np.random.default_rng(0)
        m = 12
        a = rng.standard_normal(m)
        b = rng.standard_normal(m - 1)
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        d = np.sort(np.linalg.eigvalsh(T))
        mu = d[0]  # exact shift
        V, H = qrstep(np.eye(m), T.copy(), mu, 0, m)
        # Orthogonal similarity: spectrum preserved.
        np.testing.assert_allclose(np.sort(np.linalg.eigvalsh((H + H.T) / 2)), d, atol=1e-9)
        # Exact shift deflates: the last subdiagonal entry vanishes and
        # H[m-1, m-1] equals the shifted-away eigenvalue.
        assert abs(H[m - 1, m - 2]) < 1e-8
        np.testing.assert_allclose(H[m - 1, m - 1], mu, atol=1e-8)
        # V orthogonal.
        np.testing.assert_allclose(V.T @ V, np.eye(m), atol=1e-12)


class TestIRL:
    @pytest.mark.parametrize("inner", ["std", "ca", "arnoldi"])
    def test_diagonal(self, inner):
        n = 400
        A = diag_spectrum(n, 1.0, 100.0)
        r = jnp.ones((n,), jnp.float64)
        res = impl_restarted_ca_lanczos(
            A, r, max_lanczos=40, n_wanted=6, s=4, basis=Basis.MONOMIAL,
            orth=Orth.FULL, tol=1e-8, inner=inner,
        )
        assert res.converged, f"IRL({inner}) not converged in {res.n_restarts}"
        exact = np.linspace(1, 100, n)[::-1][:6]
        np.testing.assert_allclose(res.eigs, exact, rtol=1e-6)

    def test_newton_basis(self):
        n = 300
        A = diag_spectrum(n, 1.0, 50.0)
        r = jnp.ones((n,), jnp.float64)
        res = impl_restarted_ca_lanczos(
            A, r, max_lanczos=36, n_wanted=4, s=4, basis=Basis.NEWTON,
            orth=Orth.FULL, tol=1e-8, inner="ca",
        )
        assert res.converged
        exact = np.linspace(1, 50, n)[::-1][:4]
        np.testing.assert_allclose(res.eigs, exact, rtol=1e-6)


class TestArnoldi:
    def test_factorization_identity(self):
        n, m = 200, 20
        A = laplacian_1d(n)
        q = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        Q, H = arnoldi(A, q, m)
        Qn = np.asarray(Q)
        Ad = np.asarray(A.to_dense())
        np.testing.assert_allclose(Ad @ Qn[:, :m], Qn @ H, atol=1e-11)
        np.testing.assert_allclose(Qn.T @ Qn, np.eye(m + 1), atol=1e-12)
        # Symmetric A => H is tridiagonal to roundoff.
        Hk = H[:m, :m]
        off = Hk - np.diag(np.diag(Hk)) - np.diag(np.diag(Hk, 1), 1) - np.diag(np.diag(Hk, -1), -1)
        assert np.max(np.abs(off)) < 1e-11

    def test_extension(self):
        n, m1, m2 = 150, 8, 16
        A = laplacian_1d(n)
        q = jnp.asarray(np.random.default_rng(1).standard_normal(n))
        Q1, H1 = arnoldi(A, q, m1)
        Q2, H2 = arnoldi(A, q, m2, Q=Q1, H=H1, prevvecs=m1)
        Qf, Hf = arnoldi(A, q, m2)
        np.testing.assert_allclose(np.asarray(Q2), np.asarray(Qf), atol=1e-10)
        np.testing.assert_allclose(H2, Hf, atol=1e-10)


class TestIRLLocking:
    """Deflation per the reference's TODO (impl_restarted_ca_lanczos.m:
    116-152): locked pairs persist, restart count drops vs no-locking."""

    def _clustered(self, n=500):
        # Clustered top of the spectrum: hard for non-deflating IRL
        # because converged extremes keep riding every QR sweep.
        vals = np.concatenate([
            np.linspace(1.0, 50.0, n - 8),
            np.array([99.0, 99.2, 99.4, 99.6, 100.0, 100.1, 100.2, 100.3]),
        ])
        from ca_lanczos_tpu.ops.spmv import DiaMatrix
        return DiaMatrix(data=jnp.asarray(vals)[None, :], offsets=(0,)), np.sort(vals)[::-1]

    @pytest.mark.parametrize("inner", ["std", "ca"])
    @pytest.mark.slow
    def test_locks_and_converges(self, inner):
        A, exact = self._clustered()
        r = jnp.ones((A.shape[0],), jnp.float64)
        res = impl_restarted_ca_lanczos(
            A, r, max_lanczos=40, n_wanted=6, s=4, basis=Basis.MONOMIAL,
            orth=Orth.FULL, tol=1e-9, inner=inner, lock=True,
        )
        assert res.converged
        assert res.n_locked >= 6
        np.testing.assert_allclose(res.eigs, exact[:6], rtol=1e-7)

    def test_ca_newton_locked_no_spurious(self):
        """CA inner + Newton basis + locking: the round-2 corpus campaign
        caught this combination locking Ritz values OUTSIDE the spectrum
        (true residual ~0.2) on clustered graph Laplacians — one-pass CGS
        in the CA extension lost orthogonality after deflation, and the
        bootstrap shifts sat on the locked eigenvalues.  Guard: converge,
        lock everything wanted, and every returned pair must be a true
        eigenpair (not just a T-estimate)."""
        A, exact = self._clustered()
        r = jnp.ones((A.shape[0],), jnp.float64)
        res = impl_restarted_ca_lanczos(
            A, r, max_lanczos=40, n_wanted=6, s=4, basis=Basis.NEWTON,
            orth=Orth.FULL, tol=1e-9, inner="ca", lock=True, max_restarts=60,
        )
        assert res.converged
        assert res.n_locked >= 6
        np.testing.assert_allclose(res.eigs, exact[:6], rtol=1e-7)
        Ad = np.asarray(A.to_dense())
        Qc = np.asarray(res.Q_conv)
        for i in range(6):
            v = Qc[:, i]
            assert np.linalg.norm(Ad @ v - res.eigs[i] * v) < 1e-6 * 100.0

    def test_locking_reduces_restarts(self):
        A, exact = self._clustered()
        r = jnp.ones((A.shape[0],), jnp.float64)
        kw = dict(max_lanczos=40, n_wanted=6, s=4, basis=Basis.MONOMIAL,
                  orth=Orth.FULL, tol=1e-9, inner="std", max_restarts=60)
        res_lock = impl_restarted_ca_lanczos(A, r, lock=True, **kw)
        res_free = impl_restarted_ca_lanczos(A, r, lock=False, **kw)
        assert res_lock.converged
        assert res_lock.n_restarts <= res_free.n_restarts
        np.testing.assert_allclose(res_lock.eigs, exact[:6], rtol=1e-7)

    def test_locked_pairs_persist(self):
        """Once locked, eigenvalues are bit-identical across later
        restarts (they live in a decoupled diagonal block)."""
        A, exact = self._clustered()
        r = jnp.ones((A.shape[0],), jnp.float64)
        res = impl_restarted_ca_lanczos(
            A, r, max_lanczos=40, n_wanted=8, s=4, basis=Basis.MONOMIAL,
            orth=Orth.FULL, tol=1e-9, inner="std", lock=True, max_restarts=60,
        )
        assert res.n_locked > 0
        # Locked Ritz vectors are true eigenvectors to tolerance.
        Ad = np.asarray(A.to_dense())
        Qc = np.asarray(res.Q_conv)
        for i in range(min(res.n_locked, len(res.eigs))):
            v = Qc[:, i]
            lam = res.eigs[i]
            assert np.linalg.norm(Ad @ v - lam * v) < 1e-6 * 100.0
