"""Native (C++) PELL encoder parity vs the numpy encoder and dense
oracles (native/pell_encode.cpp; round-4 VERDICT item 5 — the numpy
grouped encoder took ~47 s at 262k rows, the native one must make the
10M-row corpus scale encodable).

Both encoders emit the same plane LAYOUT; slot assignments may legally
differ, so parity is checked through the decoded matrix (to_dense) and
the interpret-mode kernel matvec, not plane-by-plane.
"""

import numpy as np
import pytest
import scipy.sparse as sp

jnp = pytest.importorskip("jax.numpy")

from ca_lanczos_tpu.ops import _pell_native
from ca_lanczos_tpu.ops.pell import PellMatrix, pell_apply

pytestmark = pytest.mark.skipif(
    not _pell_native.available(), reason="native PELL encoder not built"
)


def _patterns():
    rng = np.random.default_rng(7)
    d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (17, 17))
    lap3 = (sp.kron(sp.kron(d1, d1), d1) / 27.0).tocsr()  # 4913 rows, 27-pt
    n = 4000
    rows = np.repeat(np.arange(n), 6)
    cols = np.clip(rows + rng.integers(-300, 300, rows.shape), 0, n - 1)
    rb = sp.csr_matrix(
        (rng.standard_normal(rows.shape), (rows, cols)), (n, n)
    )
    rb.sum_duplicates()
    o = np.ones(n)
    ring = sp.diags([o, o, 4 * o, o, o], [-2, -1, 0, 1, 2], (n, n)).tolil()
    ring[0, n - 1] = ring[n - 1, 0] = 1.0
    ring[0, n - 2] = ring[n - 2, 0] = 1.0
    return {"lap27": lap3, "randband": rb, "ring": ring.tocsr()}


@pytest.mark.parametrize("name", ["lap27", "randband", "ring"])
@pytest.mark.parametrize("encoding", ["unit", "grouped", "auto"])
def test_native_matches_numpy_and_dense(name, encoding):
    a = _patterns()[name]
    Mn = PellMatrix.from_scipy(a, device=False, encoding=encoding, native=True)
    Mp = PellMatrix.from_scipy(a, device=False, encoding=encoding, native=False)
    # Same encoding choice and slot count (the K-based auto rule must
    # price identically), exact dense reconstruction for both.
    assert Mn.enc == Mp.enc
    assert Mn.k_slots == Mp.k_slots
    ref = np.asarray(a.todense())
    np.testing.assert_array_equal(Mn.to_dense(), ref)
    np.testing.assert_array_equal(Mp.to_dense(), ref)


def test_native_kernel_matvec():
    """The interpret-mode Pallas kernel consumes natively-encoded planes
    (device planes) bit-compatibly with the dense oracle."""
    a = _patterns()["lap27"]
    n = a.shape[0]
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    for encoding in ("unit", "grouped"):
        A = PellMatrix.from_scipy(a, encoding=encoding, native=True)
        y = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
        ref = a @ x.astype(np.float64)
        np.testing.assert_allclose(y[:n], ref, rtol=0, atol=1e-4)


def test_native_float64_planes():
    a = _patterns()["ring"].astype(np.float64)
    A = PellMatrix.from_scipy(a, device=False, native=True)
    assert A.host_planes[0].dtype == np.float64
    np.testing.assert_array_equal(A.to_dense(), np.asarray(a.todense()))


def test_native_empty_rows():
    """Rows/blocks with no entries must encode (zero planes) without
    native-path index errors."""
    n = 600
    a = sp.csr_matrix(
        (np.ones(3), (np.array([0, 299, 599]), np.array([0, 299, 599]))),
        (n, n),
    )
    A = PellMatrix.from_scipy(a, device=False, native=True)
    np.testing.assert_array_equal(A.to_dense(), np.asarray(a.todense()))


def test_native_grouped_fallback_matches_numpy_semantics():
    """encoding='auto' falls back to unit when the grouped constraints
    fail, mirroring the numpy encoder's None return (no exception)."""
    # A pattern with a >= 8-chunk-wide gap-free cluster per row defeats
    # the two-spread-4-window cover.
    n = 2048
    rows = np.repeat(np.arange(n), 10)
    cols = (np.arange(10) * 129)[None, :].repeat(n, 0).ravel()
    cols = np.clip(cols + rows // 10, 0, n - 1)
    a = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), (n, n))
    a.sum_duplicates()
    An = PellMatrix.from_scipy(a, device=False, encoding="auto", native=True)
    Ap = PellMatrix.from_scipy(a, device=False, encoding="auto", native=False)
    assert An.enc == Ap.enc
    np.testing.assert_array_equal(An.to_dense(), np.asarray(a.todense()))
