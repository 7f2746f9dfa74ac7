"""BSR operator tests: SpMV parity, padding, use inside the solvers."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ca_lanczos_tpu.config import Basis, Orth
from ca_lanczos_tpu.ops.bsr import BsrMatrix
from ca_lanczos_tpu.ops.matrix_powers import matrix_powers_monomial
from ca_lanczos_tpu.solvers.ca_lanczos import ca_lanczos


def _block_laplacian(n_blocks=16, bs=4, seed=0):
    """SPD block-tridiagonal matrix with dense (bs, bs) blocks."""
    rng = np.random.default_rng(seed)
    n = n_blocks * bs
    blocks = {}
    for i in range(n_blocks):
        B = rng.standard_normal((bs, bs)) * 0.1
        blocks[(i, i)] = B @ B.T + 4 * np.eye(bs)
        if i + 1 < n_blocks:
            C = rng.standard_normal((bs, bs)) * 0.2
            blocks[(i, i + 1)] = C
            blocks[(i + 1, i)] = C.T
    dense = np.zeros((n, n))
    for (i, j), B in blocks.items():
        dense[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = B
    return dense


class TestBsr:
    def test_spmv_parity(self):
        dense = _block_laplacian()
        A = BsrMatrix.from_dense(dense, block_size=4)
        n = dense.shape[0]
        x = np.random.default_rng(1).standard_normal(n)
        y = np.asarray(A.matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, dense @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(A.to_dense()), dense, atol=1e-15)

    def test_multivector(self):
        dense = _block_laplacian()
        A = BsrMatrix.from_dense(dense, block_size=4)
        X = np.random.default_rng(2).standard_normal((dense.shape[0], 5))
        Y = np.asarray(A.matvec(jnp.asarray(X)))
        np.testing.assert_allclose(Y, dense @ X, atol=1e-12)

    def test_padding_unaligned_n(self):
        dense = _block_laplacian(n_blocks=7, bs=3)[:20, :20]  # n=20, block 8
        A = BsrMatrix.from_dense(dense, block_size=8)
        assert A.n == 24  # padded to multiple of 8
        x = np.random.default_rng(3).standard_normal(20)
        xp = np.zeros(24)
        xp[:20] = x
        y = np.asarray(A.matvec(jnp.asarray(xp)))[:20]
        np.testing.assert_allclose(y, dense @ x, atol=1e-12)

    def test_in_ca_lanczos(self):
        dense = _block_laplacian(n_blocks=32, bs=4)
        A = BsrMatrix.from_dense(dense, block_size=4)
        n = dense.shape[0]
        r = jnp.ones((n,), jnp.float64)
        res = ca_lanczos(A, r, s=4, total_steps=40, basis=Basis.MONOMIAL, orth=Orth.FULL)
        d = np.sort(np.linalg.eigvalsh(res.T))[::-1]
        exact = np.sort(np.linalg.eigvalsh(dense))[::-1]
        # Top Ritz value converges to the top eigenvalue.
        np.testing.assert_allclose(d[0], exact[0], rtol=1e-8)

    def test_matrix_powers(self):
        dense = _block_laplacian()
        A = BsrMatrix.from_dense(dense, block_size=4)
        n = dense.shape[0]
        q = jnp.asarray(np.random.default_rng(4).standard_normal(n))
        V = np.asarray(matrix_powers_monomial(A, q, 3))
        ref = np.stack(
            [np.asarray(q)]
            + [np.linalg.matrix_power(dense, k) @ np.asarray(q) for k in (1, 2, 3)],
            axis=1,
        )
        np.testing.assert_allclose(V, ref, rtol=1e-10, atol=1e-10)
