"""s-step Lanczos tests: the block factorization spans the same Krylov
space as standard Lanczos, so its Ritz values must match (to the fragile
method's accuracy) and the propagator residual must be small once the
Krylov space resolves exp(-i dt H) psi."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from ca_lanczos_tpu.solvers.lanczos import lanczos
from ca_lanczos_tpu.solvers.sstep import sstep_lanczos, sstep_lanczos_prop
from ca_lanczos_tpu.utils.matrices import diag_spectrum, gaussian_packet, harmonic_oscillator, laplacian_1d


class TestSstepLanczos:
    @pytest.mark.parametrize("s,m", [(2, 4), (3, 3), (4, 3)])
    def test_ritz_parity_vs_lanczos(self, s, m):
        n = 200
        A = laplacian_1d(n)
        r = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        res = sstep_lanczos(A, r, s, m)
        ref = lanczos(A, r, s * m, orth="full")
        d_s = np.sort(np.linalg.eigvals(res.T).real)
        d_l = np.sort(np.linalg.eigvalsh(ref.T))
        # Same Krylov space; the s-step basis is unorthogonalized, so
        # agreement degrades with s*m (monomial conditioning).
        np.testing.assert_allclose(d_s, d_l, rtol=1e-5, atol=1e-5)

    def test_basis_spans_krylov(self):
        n, s, m = 100, 2, 3
        A = diag_spectrum(n, 1.0, 10.0)
        r = jnp.asarray(np.random.default_rng(1).standard_normal(n))
        res = sstep_lanczos(A, r, s, m)
        # Each basis vector must lie in K_{sm}(A, r): project onto an
        # orthonormal Krylov basis and check residual.
        K = [np.asarray(r / jnp.linalg.norm(r))]
        Ad = np.asarray(A.to_dense())
        for _ in range(s * m - 1):
            K.append(Ad @ K[-1])
        Kq, _ = np.linalg.qr(np.stack(K, axis=1))
        Q = np.asarray(res.Q)
        resid = Q - Kq @ (Kq.T @ Q)
        assert np.max(np.abs(resid)) / np.max(np.abs(Q)) < 1e-8


class TestSstepProp:
    def test_residual_and_projection(self):
        H, x = harmonic_oscillator(128, (-10.0, 10.0))
        psi = jnp.asarray(gaussian_packet(x), jnp.complex128)
        dt = 0.025
        res = sstep_lanczos_prop(H, psi, s=3, m=4, dt=dt)
        assert res.T.shape == (12, 12)
        assert np.isfinite(res.residual)
        # With 12 Krylov steps at dt=0.025 the propagation residual is
        # already far below 1 (converges like the Taylor tail).
        assert res.residual < 1e-6
