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
    @pytest.mark.parametrize("inner", ["std", "ca"])
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
