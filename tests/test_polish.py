"""f64 Rayleigh–Ritz polish (solvers/polish.py): an f32 solve's locked
block, polished against the f64 operator planes, must reach near-f64
eigenvalue parity — crossing the eps_f32*||A|| representation floor the
in-solve refine cannot (round-4 VERDICT item 3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.solvers.fused_restarted import fused_restarted_ca_lanczos
from ca_lanczos_tpu.solvers.polish import rayleigh_ritz_polish


def _op(n=40000, seed=0):
    d = np.linspace(1.0, 90.0, n)
    d[-10:] = np.linspace(95.0, 100.0, 10)
    rng = np.random.default_rng(seed)
    off = rng.standard_normal(n) * 1e-3
    data = np.zeros((3, n))
    data[0, 1:] = off[:-1]
    data[1] = d
    data[2, :-1] = off[:-1]
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    a = sp.diags([off[:-1], d, off[:-1]], [-1, 0, 1], format="csr")
    exact = np.sort(spla.eigsh(a, k=10, which="LA",
                               return_eigenvectors=False))[::-1]
    return data, exact


@pytest.mark.slow
def test_polish_crosses_f32_floor():
    data, exact = _op()
    A32 = DiaMatrix(data=jnp.asarray(data, jnp.float32), offsets=(-1, 0, 1))
    res = fused_restarted_ca_lanczos(
        A32, jnp.ones(data.shape[1], jnp.float32), 32,
        n_wanted=10, s=8, tol=1e-6, mixed_precision=True,
    )
    assert res.converged
    pre = np.max(np.abs(np.sort(res.eigs)[::-1] - exact)) / exact[0]

    A64 = DiaMatrix(data=jnp.asarray(data, jnp.float64), offsets=(-1, 0, 1))
    w, resid, Q = rayleigh_ritz_polish(A64, res.Q_conv, iters=3)
    post = np.max(np.abs(np.sort(w)[::-1] - exact)) / exact[0]
    assert post < 1e-10, (pre, post)
    assert post <= pre * 1.01
    # polished block is orthonormal (f32 storage: eps_f32-grade);
    # residuals are honest (vector angle is linear where the value error
    # is quadratic, so the residual floor sits near sqrt(err * gap))
    Qh = np.asarray(Q, np.float64)
    np.testing.assert_allclose(Qh.T @ Qh, np.eye(10), atol=2e-6)
    assert np.all(resid < 1e-3 * exact[0])
    assert post <= float(np.max(resid)) ** 2  # value err ~ resid^2 / gap


def test_polish_requires_f64_planes():
    data, _ = _op(n=2000)
    A32 = DiaMatrix(data=jnp.asarray(data, jnp.float32), offsets=(-1, 0, 1))
    with pytest.raises(ValueError):
        rayleigh_ritz_polish(A32, jnp.ones((2000, 2), jnp.float32))


def test_host_polish_matches_device():
    """The host-numpy production variant reaches the same f64-grade
    parity as the device path (it IS the 11M production path — see
    rayleigh_ritz_polish_host docstring)."""
    import scipy.sparse as sp

    from ca_lanczos_tpu.solvers.polish import rayleigh_ritz_polish_host

    data, exact = _op(n=40000)
    A32 = DiaMatrix(data=jnp.asarray(data, jnp.float32), offsets=(-1, 0, 1))
    res = fused_restarted_ca_lanczos(
        A32, jnp.ones(data.shape[1], jnp.float32), 32,
        n_wanted=10, s=8, tol=1e-6, mixed_precision=True,
    )
    assert res.converged
    a64 = sp.diags([data[0, 1:], data[1], data[2, :-1]], [-1, 0, 1],
                   format="csr")
    w, resid, Q = rayleigh_ritz_polish_host(
        lambda Z: a64 @ Z, np.asarray(res.Q_conv), iters=3, depth=4)
    post = np.max(np.abs(np.sort(w)[::-1] - exact)) / exact[0]
    assert post < 1e-11, post
    np.testing.assert_allclose(Q.T @ Q, np.eye(10), atol=1e-12)
