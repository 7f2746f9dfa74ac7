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
