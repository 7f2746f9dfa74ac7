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
