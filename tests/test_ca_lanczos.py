"""L3: CA-Lanczos — the Tk-from-R-factors recurrence and all orth modes.

The correctness crux (SURVEY.md section 7): with full orthogonalization on
a well-conditioned matrix, CA-Lanczos must reproduce standard Lanczos'
tridiagonal T to near roundoff (same Krylov space, same starting vector).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu import Basis, Orth
from ca_lanczos_tpu.solvers import ca_lanczos, lanczos
from ca_lanczos_tpu.solvers.ca_lanczos import monomial_basis_matrix
from ca_lanczos_tpu.utils.matrices import diag_spectrum, laplacian_1d, laplacian_2d
from ca_lanczos_tpu.ops.spmv import DiaMatrix


def _geo_spectrum(n=300, k=4):
    d = np.logspace(0, k, n)
    return DiaMatrix(data=jnp.asarray(d)[None, :], offsets=(0,))


def _start(n, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(n))


class TestTkRecurrence:
    @pytest.mark.parametrize("s", [2, 4, 6])
    def test_monomial_matches_standard_lanczos(self, s):
        """T from R factors == T from the three-term recurrence."""
        A = laplacian_2d(10, 10)
        r = _start(100)
        m = 4 * s
        std = lanczos(A, r, m, Orth.FULL)
        ca = ca_lanczos(A, r, s, m, Basis.MONOMIAL, Orth.FULL)
        np.testing.assert_allclose(ca.T, std.T, atol=1e-7 * np.abs(std.T).max())

    @pytest.mark.parametrize("s", [4, 6])
    def test_newton_matches_standard_lanczos(self, s):
        A = diag_spectrum(200, 1.0, 100.0)
        r = _start(200, seed=1)
        m = 4 * s
        std = lanczos(A, r, m, Orth.FULL)
        ca = ca_lanczos(A, r, s, m, Basis.NEWTON, Orth.FULL)
        np.testing.assert_allclose(ca.T, std.T, atol=1e-7 * np.abs(std.T).max())

    def test_beta_consistency(self):
        """T_ext trailing beta equals the recurrence beta (ca_lanczos.m:214)."""
        A = laplacian_1d(150)
        r = _start(150, seed=2)
        ca = ca_lanczos(A, r, 4, 16, Basis.MONOMIAL, Orth.LOCAL)
        assert ca.T_ext.shape == (17, 16)
        assert ca.T_ext[16, 15] == ca.beta[-1]


class TestCaLanczosModes:
    def test_local_monomial_converges(self):
        """Minimum end-to-end slice (SURVEY.md section 7): diagonal
        spectrum, s=4, monomial, local orth."""
        A = diag_spectrum(500, 1.0, 100.0)
        r = jnp.ones(500)
        res = ca_lanczos(A, r, 4, 120, Basis.MONOMIAL, Orth.LOCAL)
        ritz = np.linalg.eigvalsh(res.T)
        assert abs(ritz[-1] - 100.0) / 100.0 < 1e-6
        # Orthogonality within the returned basis stays reasonable.
        Q = np.asarray(res.Q)
        assert np.max(np.abs(Q.T @ Q - np.eye(Q.shape[1]))) < 1e-2

    def test_newton_beats_monomial_conditioning(self):
        """Newton (Leja-shifted) basis keeps the powers block better
        conditioned than monomial for larger s — the reason it exists."""
        A = _geo_spectrum(300, 3)
        r = _start(300, seed=3)
        s = 8
        res_m = ca_lanczos(A, r, s, 4 * s, Basis.MONOMIAL, Orth.LOCAL)
        res_n = ca_lanczos(A, r, s, 4 * s, Basis.NEWTON, Orth.LOCAL)
        Qm, Qn = np.asarray(res_m.Q), np.asarray(res_n.Q)
        loss_m = np.max(np.abs(Qm.T @ Qm - np.eye(Qm.shape[1])))
        loss_n = np.max(np.abs(Qn.T @ Qn - np.eye(Qn.shape[1])))
        assert loss_n < loss_m

    def test_periodic(self):
        A = _geo_spectrum()
        r = _start(300, seed=4)
        res = ca_lanczos(A, r, 4, 60, Basis.NEWTON, Orth.PERIODIC)
        Q = np.asarray(res.Q)
        assert np.max(np.abs(Q.T @ Q - np.eye(Q.shape[1]))) < 1e-6
        ritz = np.linalg.eigvalsh(res.T)
        assert abs(ritz[-1] - 1e4) / 1e4 < 1e-8

    def test_selective(self):
        A = _geo_spectrum()
        r = _start(300, seed=5)
        res = ca_lanczos(A, r, 4, 60, Basis.NEWTON, Orth.SELECTIVE)
        ritz = np.linalg.eigvalsh(res.T)
        assert abs(ritz[-1] - 1e4) / 1e4 < 1e-8
        assert np.sum(np.abs(ritz - 1e4) / 1e4 < 1e-6) == 1

    def test_full(self):
        A = _geo_spectrum()
        r = _start(300, seed=6)
        res = ca_lanczos(A, r, 4, 60, Basis.NEWTON, Orth.FULL)
        Q = np.asarray(res.Q)
        assert np.max(np.abs(Q.T @ Q - np.eye(Q.shape[1]))) < 1e-10

    def test_diagnostics_shapes(self):
        A = diag_spectrum(100, 1.0, 10.0)
        res = ca_lanczos(A, jnp.ones(100), 4, 16, Basis.MONOMIAL, Orth.LOCAL, diagnostics=True)
        assert res.ritz_rnorm.shape == (4, 16)
        assert res.orth_err.shape == (4,)

    def test_explicit_Bk_reused(self):
        A = diag_spectrum(100, 1.0, 10.0)
        Bk = monomial_basis_matrix(4)
        res = ca_lanczos(A, jnp.ones(100), 4, 16, Basis.MONOMIAL, Orth.LOCAL, Bk=Bk)
        np.testing.assert_array_equal(res.Bk, Bk)
