"""Pallas DIA matrix-powers kernel: interpret-mode parity on CPU (the
compiled path is exercised on the real chip by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu.ops.matrix_powers import _newton_scan, matrix_powers_monomial
from ca_lanczos_tpu.ops.pallas_spmv import matrix_powers_dia_pallas, pick_tile
from ca_lanczos_tpu.ops.spmv import DiaMatrix


def _banded(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    data = np.asarray(rng.standard_normal((len(offsets), n)), np.float32) * 0.1
    for d, k in enumerate(offsets):
        if k > 0:
            data[d, n - k :] = 0
        elif k < 0:
            data[d, : -k] = 0
    return DiaMatrix(data=jnp.asarray(data), offsets=tuple(offsets))


class TestPickTile:
    def test_divisor_and_alignment(self):
        assert pick_tile(1 << 22) == 65536
        assert pick_tile(3 * 1024) == 3 * 1024
        assert pick_tile(5000) == 0  # not a multiple of 1024
        t = pick_tile(6 * 1024, tile=4096)
        assert t in (2048, 3072) and 6 * 1024 % t == 0


class TestPallasKernel:
    @pytest.mark.parametrize("offsets", [(-1, 0, 1), (-4, -2, 0, 2, 4)])
    def test_monomial_parity(self, offsets):
        n = 2048
        A = _banded(n, offsets)
        q = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)
        V_ref = matrix_powers_monomial(A, q, 4)
        V_pal = matrix_powers_dia_pallas(A, q, 4, tile=1024, interpret=True)
        np.testing.assert_array_equal(np.asarray(V_ref), np.asarray(V_pal))

    def test_newton_parity(self):
        n = 2048
        A = _banded(n, (-2, -1, 0, 1, 2))
        q = jnp.asarray(np.random.default_rng(2).standard_normal(n), jnp.float32)
        diag = np.array([0.3, -0.2, 0.1, 0.5])
        sub = np.array([0.0, 0.04, 0.0, 0.01])
        V_ref = _newton_scan(A, q, 4, jnp.asarray(diag, jnp.float32), jnp.asarray(sub, jnp.float32))
        V_pal = matrix_powers_dia_pallas(A, q, 4, diag, sub, tile=1024, interpret=True)
        np.testing.assert_array_equal(np.asarray(V_ref), np.asarray(V_pal))

    def test_fallback_unaligned_n(self):
        n = 500  # no aligned tile -> XLA fallback
        A = _banded(n, (-1, 0, 1))
        q = jnp.asarray(np.random.default_rng(3).standard_normal(n), jnp.float32)
        V_ref = matrix_powers_monomial(A, q, 3)
        V_pal = matrix_powers_dia_pallas(A, q, 3)
        np.testing.assert_allclose(np.asarray(V_ref), np.asarray(V_pal), atol=1e-6)


class TestFusedKernel:
    @pytest.mark.parametrize("offsets", [(-1, 0, 1), (-4, -2, 0, 2, 4)])
    def test_monomial_parity(self, offsets):
        from ca_lanczos_tpu.ops.pallas_spmv import matrix_powers_dia_fused

        n = 4096
        A = _banded(n, offsets)
        q = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)
        V_ref = matrix_powers_monomial(A, q, 4)
        V = matrix_powers_dia_fused(A, q, 4, tile=2048, interpret=True)
        np.testing.assert_allclose(np.asarray(V), np.asarray(V_ref), rtol=1e-5, atol=1e-5)

    def test_newton_parity(self):
        from ca_lanczos_tpu.ops.pallas_spmv import matrix_powers_dia_fused

        n = 4096
        A = _banded(n, (-2, -1, 0, 1, 2))
        q = jnp.asarray(np.random.default_rng(2).standard_normal(n), jnp.float32)
        diag = np.array([0.3, -0.2, 0.1, 0.5])
        sub = np.array([0.0, 0.04, 0.0, 0.01])
        V_ref = _newton_scan(A, q, 4, jnp.asarray(diag, jnp.float32), jnp.asarray(sub, jnp.float32))
        V = matrix_powers_dia_fused(A, q, 4, diag, sub, tile=2048, interpret=True)
        np.testing.assert_allclose(np.asarray(V), np.asarray(V_ref), rtol=1e-5, atol=1e-5)

    def test_fallback_small_tile(self):
        from ca_lanczos_tpu.ops.pallas_spmv import matrix_powers_dia_fused

        # W >= tile -> per-step/XLA fallback still correct
        n = 2048
        A = _banded(n, (-1, 0, 1))
        q = jnp.asarray(np.random.default_rng(3).standard_normal(n), jnp.float32)
        V_ref = matrix_powers_monomial(A, q, 3)
        V = matrix_powers_dia_fused(A, q, 3, tile=1024, interpret=True)
        np.testing.assert_allclose(np.asarray(V), np.asarray(V_ref), atol=1e-5)


class TestKernelSeamDtype:
    """Mosaic kernels are f32-only: a 64-bit operand recurses Mosaic's
    convert-element-type lowering (jax 0.9).  The DIA kernels cast f64
    driver state to f32 at the kernel seam when compiling (interpret=
    False) and return at the caller's dtype — the same contract as the
    ilv/PELL engines (parallel/step.py body_ilv).  Caught live: the
    natural-path distributed restarted driver (f64 history dtype under
    x64) crashed at trace time on the real chip."""

    @staticmethod
    def _pallas_eqns(jaxpr, out):
        for eq in jaxpr.eqns:
            if eq.primitive.name == "pallas_call":
                out.append(eq)
            for v in eq.params.values():
                if hasattr(v, "eqns"):
                    TestKernelSeamDtype._pallas_eqns(v, out)
                elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                    TestKernelSeamDtype._pallas_eqns(v.jaxpr, out)
        return out

    def _assert_seam(self, fn, args, expect_kernel, expect_out):
        import jax

        jx = jax.make_jaxpr(fn)(*args)
        eqns = self._pallas_eqns(jx.jaxpr, [])
        assert eqns, "no pallas_call found in the traced computation"
        for eq in eqns:
            for v in eq.invars + eq.outvars:
                assert v.aval.dtype == expect_kernel, (
                    f"pallas operand/result at {v.aval.dtype}, kernel "
                    f"seam must pin {expect_kernel}"
                )
        for v in jx.jaxpr.outvars:
            assert v.aval.dtype == expect_out

    def test_fused_f64_state_compiled(self):
        from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused

        n, s, W = 4096, 4, 1024
        dflat = jnp.zeros(3 * (n + 2 * W), jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        coefs = jnp.zeros((s, 2))
        assert x.dtype == jnp.float64  # x64 on (conftest)
        self._assert_seam(
            lambda d, xx, c: _dia_powers_fused(
                d, xx, c, (-1, 0, 1), s, tile=1024, interpret=False
            ),
            (dflat, x, coefs),
            jnp.float32,
            jnp.float64,
        )

    def test_step_f64_state_compiled(self):
        from ca_lanczos_tpu.ops.pallas_spmv import _dia_power_step

        n = 4096
        data = jnp.zeros((3, n), jnp.float64)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(n))
        self._assert_seam(
            lambda d, xx, c: _dia_power_step(
                d, xx, jnp.zeros_like(xx), c, (-1, 0, 1), tile=1024,
                interpret=False,
            ),
            (data, x, jnp.zeros(2)),
            jnp.float32,
            jnp.float64,
        )

    def test_fused_f64_interpret_stays_f64(self):
        # Interpret-mode f64 parity runs must NOT be truncated to f32.
        from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused

        n, s, W = 4096, 4, 1024
        dflat = jnp.zeros(3 * (n + 2 * W), jnp.float64)
        x = jnp.asarray(np.random.default_rng(2).standard_normal(n))
        coefs = jnp.zeros((s, 2))
        self._assert_seam(
            lambda d, xx, c: _dia_powers_fused(
                d, xx, c, (-1, 0, 1), s, tile=1024, interpret=True
            ),
            (dflat, x, coefs),
            jnp.float64,
            jnp.float64,
        )

    def test_fused_f64_interpret_parity(self):
        # The seam must not change interpret-mode numerics: f64 operands
        # round-trip the fused kernel at full precision.
        from ca_lanczos_tpu.ops.pallas_spmv import matrix_powers_dia_fused

        n = 4096
        A64 = DiaMatrix(
            data=jnp.asarray(np.asarray(_banded(n, (-1, 0, 1)).data), jnp.float64),
            offsets=(-1, 0, 1),
        )
        q = jnp.asarray(np.random.default_rng(3).standard_normal(n))
        V_ref = matrix_powers_monomial(A64, q, 4)
        V = matrix_powers_dia_fused(A64, q, 4, tile=2048, interpret=True)
        assert V.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(V), np.asarray(V_ref), rtol=1e-12)
