"""Interleaved-layout fused s-step kernel: interpret-mode parity against
the XLA three-term recurrence (ops.pallas_ilv; hardware pricing pending
per its module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu.ops.pallas_ilv import (
    J,
    dia_powers_ilv,
    ilv_data_tiled,
    ilv_decode,
    ilv_encode,
)
from ca_lanczos_tpu.ops.spmv import DiaMatrix


def make_op(n, nd=9, seed=0):
    rng = np.random.default_rng(seed)
    half = nd // 2
    offsets = tuple(range(-half, half + 1))
    data = (rng.standard_normal((nd, n)) / nd).astype(np.float32)
    return DiaMatrix(data=jnp.asarray(data), offsets=offsets)


class TestIlvCodec:
    def test_encode_decode_roundtrip(self):
        x = np.arange(8 * 4096, dtype=np.float32)
        np.testing.assert_array_equal(ilv_decode(ilv_encode(x)), x)
        np.testing.assert_array_equal(ilv_encode(ilv_decode(x)), x)


class TestIlvKernelParity:
    @pytest.mark.parametrize("s,with_coefs", [(3, True), (4, False)])
    def test_matches_xla_recurrence(self, s, with_coefs):
        from ca_lanczos_tpu.ops.matrix_powers import _newton_scan

        n, Tq = 8 * 2048 * 2, 1024  # nq=4096, 4 tiles
        A = make_op(n)
        rng = np.random.default_rng(1)
        x = np.asarray(rng.standard_normal(n), np.float32)
        coefs_np = (rng.standard_normal((s, 2)) * 0.1).astype(np.float32)
        if not with_coefs:
            coefs_np[:] = 0.0
        coefs = jnp.asarray(coefs_np)

        V_ref = np.asarray(
            _newton_scan(
                A, jnp.asarray(x), s,
                jnp.asarray(coefs_np[:, 0]), jnp.asarray(coefs_np[:, 1]),
            )
        )  # (n, s+1)

        dfl = jnp.asarray(ilv_data_tiled(A, Tq))
        x_il = jnp.asarray(ilv_encode(x))
        Vf, lf = dia_powers_ilv(
            dfl, x_il, coefs, A.offsets, s, Tq, n,
            interpret=True, with_coefs=with_coefs,
        )
        Vf = np.asarray(Vf).reshape(s, n)
        for j in range(s):
            np.testing.assert_allclose(
                ilv_decode(Vf[j]), V_ref[:, j + 1], rtol=2e-5, atol=2e-6,
                err_msg=f"step {j}",
            )
        np.testing.assert_allclose(
            ilv_decode(np.asarray(lf)), V_ref[:, s], rtol=2e-5, atol=2e-6
        )


class TestIlvGuards:
    """Validity guards: silently-wrong configurations must raise."""

    def test_halo_overflow_raises(self):
        # offset 4096 -> carry ceil(4096/8)=512 q-elements/step: s=2 fits
        # the WQ=1024 halo exactly, s=4 needs 2048 and must be rejected
        # (it used to return wrong steps 3-4 silently).
        n = 8 * 2048
        data = np.ones((3, n), np.float32)
        A = DiaMatrix(data=jnp.asarray(data), offsets=(-4096, 0, 4096))
        rng = np.random.default_rng(0)
        x_il = jnp.asarray(ilv_encode(rng.standard_normal(n).astype(np.float32)))
        dfl = jnp.asarray(ilv_data_tiled(A, 1024))
        coefs = jnp.zeros((4, 2), jnp.float32)
        with pytest.raises(ValueError, match="halo overflow"):
            dia_powers_ilv(dfl, x_il, coefs, A.offsets, 4, 1024, n,
                           interpret=True)
        # s=2 passes the guard and computes correctly
        V, _ = dia_powers_ilv(dfl, x_il, coefs[:2], A.offsets, 2, 1024, n,
                              interpret=True)
        from ca_lanczos_tpu.ops.matrix_powers import matrix_powers_monomial

        V_ref = np.asarray(matrix_powers_monomial(A, jnp.asarray(
            ilv_decode(np.asarray(x_il))), 2))
        np.testing.assert_allclose(
            ilv_decode(np.asarray(V).reshape(2, n)[1]), V_ref[:, 2],
            rtol=2e-5, atol=2e-6)

    def test_pick_tq_respects_vmem_budget(self):
        from ca_lanczos_tpu.ops.pallas_ilv import KPAD, WQ, pick_tq

        n = 8 * 16384 * 2
        assert pick_tq(n, nd=9) == 16384
        # diagonal-heavy operators degrade to a smaller tile instead of
        # failing at compile time
        tq13 = pick_tq(n, nd=13)
        assert 0 < tq13 < 16384
        lq = tq13 + 2 * WQ
        assert (2 * 13 * J * lq + 4 * (2 * KPAD + J * lq)) * 4 <= 15.5e6


class TestIlvOperator:
    """IlvDiaMatrix = P A P^T: drivers run unchanged in the permuted
    space (same spectrum); only Ritz vectors decode."""

    def _pair(self, n=8 * 2048 * 2, seed=0):
        from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix

        A = make_op(n, seed=seed)
        return A, IlvDiaMatrix.from_dia(A)

    def test_matvec_parity(self):
        from ca_lanczos_tpu.ops.pallas_ilv import ilv_decode_jax, ilv_encode_jax

        A, Ail = self._pair()
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal(A.n), jnp.float32)
        y = np.asarray(ilv_decode_jax(Ail.matvec(ilv_encode_jax(x))))
        np.testing.assert_allclose(y, np.asarray(A.matvec(x)),
                                   rtol=2e-5, atol=2e-6)

    def test_matvec_2d_multivector(self):
        # 2-D blocks go through the column loop (a vmapped pallas_call
        # does not lower on TPU); fused_restarted's verification SpMV
        # and `spmv(A, X)` drivers land here.
        A, Ail = self._pair()
        rng = np.random.default_rng(7)
        X = jnp.asarray(rng.standard_normal((A.n, 3)), jnp.float32)
        X_il = jnp.stack([Ail.encode(X[:, j]) for j in range(3)], axis=1)
        Y = np.asarray(Ail.decode(Ail.matvec(X_il)))
        np.testing.assert_allclose(Y, np.asarray(A.matvec(X)),
                                   rtol=2e-5, atol=2e-6)

    def test_powers_dispatch_newton_parity(self):
        from ca_lanczos_tpu.config import Basis
        from ca_lanczos_tpu.ops.matrix_powers import matrix_powers
        from ca_lanczos_tpu.ops.pallas_ilv import ilv_decode_jax, ilv_encode_jax

        A, Ail = self._pair(seed=1)
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.standard_normal(A.n), jnp.float32)
        s = 3
        Bk = np.zeros((s + 1, s))
        Bk[np.arange(s), np.arange(s)] = [0.1, -0.2, 0.05]
        Bk[np.arange(1, s + 1), np.arange(s)] = 1.0
        V_ref = np.asarray(matrix_powers(A, q, s, Bk, Basis.NEWTON))
        V_il = matrix_powers(Ail, ilv_encode_jax(q), s, Bk, Basis.NEWTON)
        V = np.asarray(jax.vmap(ilv_decode_jax, in_axes=1, out_axes=1)(V_il))
        np.testing.assert_allclose(V, V_ref, rtol=2e-5, atol=2e-6)

    def test_ca_lanczos_rides_the_carrier(self):
        """End-to-end: the CA driver on the interleaved operator
        reproduces the DiaMatrix run's tridiagonal T (the permuted
        problem is unitarily equivalent)."""
        from ca_lanczos_tpu import Basis, Orth
        from ca_lanczos_tpu.ops.pallas_ilv import ilv_encode_jax
        from ca_lanczos_tpu.solvers import ca_lanczos

        A, Ail = self._pair(seed=2)
        rng = np.random.default_rng(5)
        r = jnp.asarray(rng.standard_normal(A.n), jnp.float32)
        s, m = 4, 8
        ref = ca_lanczos(A, r, s, m, Basis.MONOMIAL, Orth.FULL)
        ilv = ca_lanczos(Ail, ilv_encode_jax(r), s, m, Basis.MONOMIAL, Orth.FULL)
        np.testing.assert_allclose(
            np.asarray(ilv.T), np.asarray(ref.T),
            atol=1e-4 * float(np.abs(np.asarray(ref.T)).max()),
        )


class TestIlvKernelSeamDtype:
    def test_f64_state_compiled_casts_to_f32(self):
        # Same contract as the DIA kernels (test_pallas.py
        # TestKernelSeamDtype): compiling with a 64-bit operand must pin
        # the pallas_call at f32 (Mosaic convert recursion otherwise)
        # and return at the caller's dtype.
        from tests.test_pallas import TestKernelSeamDtype

        n, Tq, s = 8 * 2048 * 2, 1024, 3
        A = make_op(n)
        dfl = jnp.asarray(ilv_data_tiled(A, Tq))
        x_il = jnp.asarray(ilv_encode(
            np.asarray(np.random.default_rng(2).standard_normal(n))))
        assert x_il.dtype == jnp.float64  # x64 on (conftest)
        coefs = jnp.zeros((s, 2))
        jx = jax.make_jaxpr(
            lambda d, xx, c: dia_powers_ilv(
                d, xx, c, A.offsets, s, Tq, n, interpret=False
            )
        )(dfl, x_il, coefs)
        eqns = TestKernelSeamDtype._pallas_eqns(jx.jaxpr, [])
        assert eqns
        for eq in eqns:
            for v in eq.invars + eq.outvars:
                assert v.aval.dtype == jnp.float32
        for v in jx.jaxpr.outvars:
            assert v.aval.dtype == jnp.float64
