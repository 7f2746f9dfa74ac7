"""Mixed precision (OrthParams.mixed_precision): f32 basis storage with
f64 Gram/R/T reductions must deliver near-f64 eigenpairs (VERDICT item 5;
the TPU-native answer to f32's ~1e-2 hardware eigenvalue error)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu.config import Basis, LanczosConfig, Orth, OrthParams, QrMethod
from ca_lanczos_tpu.ops.qr import cholqr2, cholqr2_mp
from ca_lanczos_tpu.solvers.restarted import restarted_ca_lanczos
from ca_lanczos_tpu.utils.matrices import diag_spectrum


class TestMpQr:
    def test_cholqr2_mp_orthogonality(self):
        rng = np.random.default_rng(0)
        X = np.asarray(rng.standard_normal((4096, 9)), np.float32)
        X[:, 1] = X[:, 0] + 1e-3 * X[:, 1]  # mildly ill-conditioned

        Q32, R32 = cholqr2(jnp.asarray(X))
        Qmp, Rmp = cholqr2_mp(jnp.asarray(X))
        assert Qmp.dtype == jnp.float32
        assert Rmp.dtype == jnp.float64

        def orth_err(Q):
            Q = np.asarray(Q, np.float64)
            return np.max(np.abs(Q.T @ Q - np.eye(Q.shape[1])))

        # The mp factor's R reproduces X to f32 roundoff and the
        # orthogonality is at least as good as the plain-f32 path.
        np.testing.assert_allclose(
            np.asarray(Qmp, np.float64) @ np.asarray(Rmp), X, atol=5e-5
        )
        assert orth_err(Qmp) <= orth_err(Q32) * 1.5 + 1e-6

    def test_chunked_f64_reductions_match_direct(self, monkeypatch):
        """Above _MP_CHUNK_ROWS the f64 reductions run row-chunked so no
        promoted basis copy is resident (the 10M-row flagship OOMed on
        the direct path); results must match the direct computation to
        f64 summation order."""
        import ca_lanczos_tpu.ops.qr as qr

        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.standard_normal((2048, 9)), jnp.float32)
        Y = jnp.asarray(rng.standard_normal((2048, 5)), jnp.float32)
        R = jnp.asarray(rng.standard_normal((9, 5)))
        G_dir = np.asarray(qr.gram_f64(X, Y))
        S_dir = np.asarray(qr.sub_proj_f64(Y, X, R))
        monkeypatch.setattr(qr, "_MP_CHUNK_ROWS", 128)
        assert qr._mp_chunk_shape(2048) is not None
        np.testing.assert_allclose(np.asarray(qr.gram_f64(X, Y)), G_dir,
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(qr.sub_proj_f64(Y, X, R)),
                                      S_dir)
        Xw = np.asarray(X, np.float64)
        Qc, Rc = qr.cholqr_mp(X)
        np.testing.assert_allclose(
            np.asarray(Qc, np.float64) @ np.asarray(Rc), Xw, atol=5e-5
        )
        # prime row count falls back to the direct path
        assert qr._mp_chunk_shape(2053) is None


class TestMpFlagship:
    @pytest.mark.slow
    def test_f32_storage_f64_reductions_beats_plain_f32(self):
        n = 4000
        A64 = diag_spectrum(n, 1.0, 100.0)
        from ca_lanczos_tpu.ops.spmv import DiaMatrix
        A32 = DiaMatrix(
            data=jnp.asarray(np.asarray(A64.data), jnp.float32),
            offsets=A64.offsets,
        )
        exact = np.linspace(1.0, 100.0, n)[::-1][:6]
        r = jnp.ones(n, jnp.float32)

        base = LanczosConfig(
            s=6, basis=Basis.NEWTON, orth=Orth.LOCAL, n_wanted=6, tol=1e-7,
            orth_params=OrthParams(qr_method=QrMethod.CHOLQR2),
        )
        cfg_mp = dataclasses.replace(
            base,
            orth_params=OrthParams(
                qr_method=QrMethod.CHOLQR2, mixed_precision=True
            ),
        )

        res_mp = restarted_ca_lanczos(A32, r, 48, cfg_mp)
        assert res_mp.converged
        err_mp = np.max(
            np.abs(np.sort(res_mp.eigs)[::-1] - exact)
        ) / 100.0
        # f32 storage + f64 reductions: relative eigenvalue error well
        # below f32 epsilon accumulation (target <= 1e-6).
        assert err_mp <= 1e-6, f"mp eig err {err_mp:.2e}"

        res_32 = restarted_ca_lanczos(A32, r, 48, base)
        if res_32.converged and len(res_32.eigs) == 6:
            err_32 = np.max(
                np.abs(np.sort(res_32.eigs)[::-1] - exact)
            ) / 100.0
            assert err_mp <= err_32 + 1e-12


class TestFusedMixedPrecision:
    """Mixed precision inside the one-XLA-call fused driver: f32
    basis/SpMV with f64 Gram/R/T/eigh on device, plus the final
    residual-augmented Rayleigh-Ritz polish of the locked block."""

    def _problem(self, n=4000):
        from ca_lanczos_tpu.ops.spmv import DiaMatrix

        vals = np.linspace(1.0, 90.0, n)
        vals[-10:] = np.linspace(95.0, 100.0, 10)  # separated top cluster
        A = DiaMatrix(data=jnp.asarray(vals, jnp.float32)[None, :], offsets=(0,))
        return A, np.sort(vals)[::-1][:10]

    def test_fused_mp_beats_plain_f32(self):
        from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos

        A, exact = self._problem()
        r = jnp.ones(4000, jnp.float32)
        res = fused_restarted_ca_lanczos(
            A, r, 48, n_wanted=10, s=8, tol=1e-7, mixed_precision=True
        )
        assert res.converged
        got = np.sort(res.eigs)[::-1]
        # Plain f32 is chaotic on this problem (1.7e-7 on the 8-device
        # CPU build, 5.5e-3 single-device, 0.85 on hardware — rounding-
        # order dependent), which is exactly why mixed precision exists;
        # assert only the deterministic mp bound (measured 3.1e-6).
        assert np.max(np.abs(got - exact)) / 100.0 < 1e-4

    def test_fused_f64_polish_reaches_machine_accuracy(self):
        from ca_lanczos_tpu.ops.spmv import DiaMatrix
        from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos

        n = 4000
        vals = np.linspace(1.0, 90.0, n)
        vals[-10:] = np.linspace(95.0, 100.0, 10)
        A = DiaMatrix(data=jnp.asarray(vals, jnp.float64)[None, :], offsets=(0,))
        exact = np.sort(vals)[::-1][:10]
        res = fused_restarted_ca_lanczos(
            A, jnp.ones(n, jnp.float64), 48, n_wanted=10, s=8, tol=1e-10
        )
        assert res.converged
        got = np.sort(res.eigs)[::-1]
        assert np.max(np.abs(got - exact)) / 100.0 < 1e-13  # measured 8.5e-16
