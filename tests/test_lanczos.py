"""L3: standard Lanczos driver — convergence vs exact spectra, all orth modes.

Mirrors test_convergence_diagonal_matrices.m: diagonal matrices with
linspace spectra give exactly-known eigenvalues.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu import Orth
from ca_lanczos_tpu.solvers import lanczos
from ca_lanczos_tpu.utils.matrices import diag_spectrum, laplacian_2d



def _run(A, m, orth, n=None, seed=0):
    n = A.shape[0]
    r = jnp.asarray(np.random.default_rng(seed).standard_normal(n))
    return lanczos(A, r, m, orth)


class TestLanczosBasic:
    def test_full_orth_converges_extremes(self):
        A = diag_spectrum(150, 1.0, 100.0)
        res = _run(A, 120, Orth.FULL)
        ritz = np.linalg.eigvalsh(res.T)
        assert abs(ritz[-1] - 100.0) < 1e-8
        assert abs(ritz[0] - 1.0) < 1e-8

    def test_full_orth_orthogonality(self):
        A = diag_spectrum(300, 1.0, 1000.0)
        res = _run(A, 80, Orth.FULL)
        Q = np.asarray(res.Q)
        assert np.max(np.abs(Q.T @ Q - np.eye(80))) < 1e-10

    def test_tridiagonal_structure(self):
        A = diag_spectrum(200, 1.0, 50.0)
        res = _run(A, 20, Orth.LOCAL)
        T = res.T
        assert T.shape == (20, 20)
        np.testing.assert_allclose(T, T.T, atol=1e-12)
        assert np.allclose(np.triu(T, 2), 0)
        assert res.T_ext.shape == (21, 20)
        assert res.T_ext[20, 19] == res.beta[19]

    def _geo(self):
        d = np.logspace(0, 4, 300)
        return diag_spectrum(300, 1.0, 1.0).__class__(
            data=jnp.asarray(d)[None, :], offsets=(0,)
        )

    def test_local_orth_loses_orthogonality(self):
        """Local orth on a geometric spectrum loses orthogonality once the
        top Ritz pair converges and produces a duplicate Ritz copy — the
        motivation for the other three modes."""
        res = _run(self._geo(), 60, Orth.LOCAL)
        Q = np.asarray(res.Q)
        assert np.max(np.abs(Q.T @ Q - np.eye(60))) > 1e-2
        ritz = np.linalg.eigvalsh(res.T)
        assert np.sum(np.abs(ritz - 1e4) / 1e4 < 1e-6) >= 2  # ghost copy

    def test_periodic_orth_maintains_orthogonality(self):
        res = _run(self._geo(), 60, Orth.PERIODIC)
        Q = np.asarray(res.Q)
        assert res.n_reorth > 0
        assert np.max(np.abs(Q.T @ Q - np.eye(60))) < 1e-8

    def test_selective_orth_converges(self):
        res = _run(self._geo(), 60, Orth.SELECTIVE)
        ritz = np.linalg.eigvalsh(res.T)
        assert abs(ritz[-1] - 1e4) / 1e4 < 1e-10
        # No spurious duplicate of the largest eigenvalue.
        assert np.sum(np.abs(ritz - 1e4) / 1e4 < 1e-6) == 1
        Q = np.asarray(res.Q)
        assert np.max(np.abs(Q.T @ Q - np.eye(60))) < 1e-7

    def test_matches_dense_oracle_laplacian(self):
        A = laplacian_2d(12, 12)
        dense = np.asarray(A.to_dense())
        eigs = np.linalg.eigvalsh(dense)
        res = _run(A, 70, Orth.FULL)
        ritz = np.linalg.eigvalsh(res.T)
        assert abs(ritz[-1] - eigs[-1]) < 1e-9
        assert abs(ritz[0] - eigs[0]) < 1e-9

    def test_diagnostics(self):
        A = diag_spectrum(100, 1.0, 10.0)
        res = _run(A, 15, Orth.FULL)
        res_d = lanczos(A, jnp.ones(100), 15, Orth.FULL, diagnostics=True)
        assert res_d.ritz_rnorm.shape == (15, 15)
        assert res_d.orth_err.shape == (15,)
        # Largest Ritz pair's residual decreases over iterations.
        assert res_d.ritz_rnorm[-1, 0] < res_d.ritz_rnorm[2, 0]
