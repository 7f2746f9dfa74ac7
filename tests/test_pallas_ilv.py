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
