"""L0: operator formats, SpMV, and matrix-powers kernels vs dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu import (
    Basis,
    DenseMatrix,
    DiaMatrix,
    EllMatrix,
    matrix_powers,
    matrix_powers_monomial,
    matrix_powers_newton,
    normest,
    spmv,
)
from ca_lanczos_tpu.ops.matrix_powers import matrix_powers_from_B
from ca_lanczos_tpu.basis.newton import newton_basis_matrix
from ca_lanczos_tpu.utils.matrices import (
    diag_spectrum,
    harmonic_oscillator,
    laplacian_1d,
    laplacian_2d,
)

def _rng(seed):
    """Per-call-site generators: a shared module RNG made test inputs
    depend on xdist scheduling (which tests land on a worker), flaking
    tight-tolerance recurrences on unlucky draws (round-5)."""
    return np.random.default_rng(seed)


def _rand_banded(n=40, seed=0):
    rng = np.random.default_rng(seed)
    a = np.zeros((n, n))
    for k in (-3, -1, 0, 2):
        d = rng.standard_normal(n - abs(k))
        a += np.diag(d, k)
    return a


class TestDia:
    def test_matvec_matches_dense(self):
        a = _rand_banded()
        A = DiaMatrix.from_dense(a)
        x = _rng(100).standard_normal(40)
        np.testing.assert_allclose(spmv(A, jnp.asarray(x)), a @ x, rtol=1e-13)

    def test_multivector(self):
        a = _rand_banded()
        A = DiaMatrix.from_dense(a)
        X = _rng(101).standard_normal((40, 5))
        np.testing.assert_allclose(spmv(A, jnp.asarray(X)), a @ X, rtol=1e-13)

    def test_to_dense_roundtrip(self):
        a = _rand_banded()
        A = DiaMatrix.from_dense(a)
        np.testing.assert_allclose(A.to_dense(), a, rtol=1e-15)

    def test_nnz(self):
        A = laplacian_1d(10)
        assert A.nnz == 10 + 9 + 9


class TestEll:
    def test_matvec_matches_dense(self):
        a = _rand_banded(seed=3)
        A = EllMatrix.from_dense(a)
        x = _rng(102).standard_normal(40)
        np.testing.assert_allclose(spmv(A, jnp.asarray(x)), a @ x, rtol=1e-13)

    def test_multivector(self):
        a = _rand_banded(seed=3)
        A = EllMatrix.from_dense(a)
        X = _rng(103).standard_normal((40, 3))
        np.testing.assert_allclose(spmv(A, jnp.asarray(X)), a @ X, rtol=1e-13)

    def test_from_scipy(self):
        import scipy.sparse as sp

        a = _rand_banded(seed=5)
        A = EllMatrix.from_scipy(sp.csr_matrix(a))
        np.testing.assert_allclose(np.asarray(A.to_dense()), a, atol=1e-15)

    def test_complex_matvec(self):
        a = _rand_banded(seed=7)
        A = EllMatrix.from_dense(a)
        x = _rng(104).standard_normal(40) + 1j * _rng(105).standard_normal(40)
        np.testing.assert_allclose(spmv(A, jnp.asarray(x)), a @ x, rtol=1e-13)


class TestBuilders:
    def test_diag_spectrum(self):
        A = diag_spectrum(50, 1.0, 100.0)
        eigs = np.linalg.eigvalsh(np.asarray(A.to_dense()))
        np.testing.assert_allclose(eigs, np.linspace(1, 100, 50), rtol=1e-14)

    def test_laplacian_1d_spd(self):
        A = laplacian_1d(20)
        d = np.asarray(A.to_dense())
        np.testing.assert_allclose(d, d.T)
        assert np.all(np.linalg.eigvalsh(d) > 0)

    def test_laplacian_2d_spd(self):
        A = laplacian_2d(5, 4)
        d = np.asarray(A.to_dense())
        np.testing.assert_allclose(d, d.T)
        assert np.all(np.linalg.eigvalsh(d) > 0)
        # interior row has 5 nonzeros
        assert (d[7] != 0).sum() == 5

    def test_harmonic_oscillator_symmetric(self):
        H, x = harmonic_oscillator(64)
        d = np.asarray(H.to_dense())
        np.testing.assert_allclose(d, d.T, atol=1e-12)
        # Lowest eigenvalues of the (periodic-FD) oscillator approach
        # (n + 1/2) for unit omega.
        eigs = np.sort(np.linalg.eigvalsh(d))
        np.testing.assert_allclose(eigs[:3], [0.5, 1.5, 2.5], atol=2e-2)


class TestNormest:
    def test_normest_diag(self):
        A = diag_spectrum(100, 1.0, 77.0)
        assert abs(normest(A) - 77.0) / 77.0 < 1e-3

    def test_normest_ones_null_vector(self):
        """Periodic/graph Laplacians annihilate the all-ones vector; a
        power iteration seeded with it must not report |A|~0 (the bug
        that zeroed every tolerance on ring/graph corpus matrices)."""
        n = 64
        data = np.zeros((3, n))
        data[0, :] = -1.0
        data[1, :] = 2.0
        data[2, :] = -1.0
        ring = np.diag(np.full(n, 2.0)) - np.diag(np.ones(n - 1), 1) - np.diag(np.ones(n - 1), -1)
        ring[0, n - 1] = ring[n - 1, 0] = -1.0  # periodic wrap: A @ 1 == 0
        A = DenseMatrix(a=jnp.asarray(ring))
        est = normest(A)
        true = np.max(np.abs(np.linalg.eigvalsh(ring)))
        assert est > 0.5 * true
        assert abs(est - true) / true < 1e-2


class TestMatrixPowers:
    def test_monomial(self):
        a = _rand_banded(seed=11)
        A = DiaMatrix.from_dense(a)
        q = _rng(106).standard_normal(40)
        V = np.asarray(matrix_powers_monomial(A, jnp.asarray(q), 4))
        assert V.shape == (40, 5)
        expect = q
        np.testing.assert_allclose(V[:, 0], q)
        for k in range(1, 5):
            expect = a @ expect
            np.testing.assert_allclose(V[:, k], expect, rtol=1e-12)

    def test_newton_real_shifts(self):
        a = _rand_banded(seed=13)
        A = DiaMatrix.from_dense(a)
        q = _rng(107).standard_normal(40)
        shifts = np.array([0.3, -1.2, 2.0, 0.0])
        V = np.asarray(matrix_powers_newton(A, jnp.asarray(q), 4, shifts))
        v = q
        np.testing.assert_allclose(V[:, 0], q)
        for k in range(4):
            v = a @ v - shifts[k] * v
            np.testing.assert_allclose(V[:, k + 1], v, rtol=1e-12)

    def test_newton_modified_conj_pairs(self):
        """Modified recurrence with a conjugate pair stays real and matches
        matrix_powers_newton.m:30-47 semantics."""
        a = _rand_banded(seed=17)
        A = DiaMatrix.from_dense(a)
        q = _rng(108).standard_normal(40)
        shifts = np.array([1.0 + 0.5j, 1.0 - 0.5j, 0.7 + 0j])
        V = np.asarray(matrix_powers_newton(A, jnp.asarray(q), 3, shifts, modified=True))
        assert not np.iscomplexobj(V)
        v0, v1 = q, a @ q - 1.0 * q
        v2 = a @ v1 - 1.0 * v1 + 0.25 * v0
        v3 = a @ v2 - 0.7 * v2
        np.testing.assert_allclose(V[:, 1], v1, rtol=1e-12)
        np.testing.assert_allclose(V[:, 2], v2, rtol=1e-12)
        np.testing.assert_allclose(V[:, 3], v3, rtol=1e-12)

    def test_from_B_matches_newton(self):
        a = _rand_banded(seed=19)
        A = DiaMatrix.from_dense(a)
        q = _rng(109).standard_normal(40)
        shifts = np.array([1.0 + 0.5j, 1.0 - 0.5j, 0.7, -0.3])
        B = newton_basis_matrix(shifts, 4, modified=True)
        V1 = np.asarray(matrix_powers_from_B(A, jnp.asarray(q), B))
        V2 = np.asarray(matrix_powers_newton(A, jnp.asarray(q), 4, shifts, modified=True))
        np.testing.assert_allclose(V1, V2, rtol=1e-12)

    def test_dispatcher_monomial_identity_B(self):
        """A V_s = V_{s+1} B must hold for both bases."""
        a = _rand_banded(seed=23)
        a = a + a.T
        A = DenseMatrix(a=jnp.asarray(a))
        q = _rng(110).standard_normal(40)
        s = 4
        I = np.eye(s + 1)
        Bmono = I[:, 1:]
        V = np.asarray(matrix_powers(A, jnp.asarray(q), s, None, Basis.MONOMIAL))
        np.testing.assert_allclose(a @ V[:, :s], V @ Bmono, rtol=1e-10, atol=1e-10)

        shifts = np.linspace(-1, 1, s)
        B = newton_basis_matrix(shifts, s)
        Vn = np.asarray(matrix_powers(A, jnp.asarray(q), s, B, Basis.NEWTON))
        np.testing.assert_allclose(a @ Vn[:, :s], Vn @ B, rtol=1e-10, atol=1e-10)
