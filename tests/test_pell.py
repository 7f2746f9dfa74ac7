"""PELL (pooled-chunk windowed ELL) format: encoder round-trip and
interpret-mode kernel parity against dense oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ca_lanczos_tpu.ops.pell import PellMatrix, matrix_powers_pell, pell_apply


def random_banded(n, bw, nnz_per_row, seed):
    """Random sparsity with per-row spread <= bw (general, not DIA)."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        lo, hi = max(0, i - bw), min(n, i + bw + 1)
        k = min(nnz_per_row, hi - lo)
        cs = rng.choice(np.arange(lo, hi), size=k, replace=False)
        rows += [i] * k
        cols += list(cs)
        vals += list(rng.standard_normal(k))
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, n))


class TestEncoder:
    def test_roundtrip_small(self):
        a = random_banded(200, 40, 5, 0)
        A = PellMatrix.from_scipy(a, tile=128, cmax=4)
        np.testing.assert_allclose(A.to_dense(), a.toarray(), atol=0)

    def test_roundtrip_2d_laplacian(self):
        nx = 18
        lap = sp.kron(sp.eye(nx), sp.diags([-1, 2, -1], [-1, 0, 1], (nx, nx))) + sp.kron(
            sp.diags([-1, 2, -1], [-1, 0, 1], (nx, nx)), sp.eye(nx)
        )
        A = PellMatrix.from_scipy(sp.csr_matrix(lap), tile=128, cmax=4)
        np.testing.assert_allclose(A.to_dense(), lap.toarray(), atol=0)

    def test_cmax_overflow_spills_to_extra_slot_tiles(self):
        # One row referencing many distinct 128-chunks: must still encode.
        n = 1500
        cols = np.arange(0, n, 130)  # one nnz per distinct chunk
        a = sp.csr_matrix(
            (np.ones(len(cols)), (np.zeros(len(cols)), cols)), shape=(n, n)
        )
        a = a + sp.eye(n)
        A = PellMatrix.from_scipy(a.tocsr(), tile=256, cmax=2)
        np.testing.assert_allclose(A.to_dense(), a.toarray(), atol=0)

    def test_wide_spread_uses_multiple_windows(self):
        # Full-width spread in tile 0: a second span window, not an error.
        n = 4096
        a = sp.eye(n).tolil()
        a[0, n - 1] = 1.0
        A = PellMatrix.from_scipy(a.tocsr(), tile=1024, sw=1024)
        assert A.n_win == 2
        np.testing.assert_allclose(A.to_dense(), a.toarray(), atol=0)

    def test_sw_optimizer_prefers_tight_windows(self):
        """Round-5: in the multi-window regime (span > SW_MAX) the
        window width minimizes total span fetch instead of a fixed 16K —
        three narrow clusters ~70K columns apart must get ~2K windows,
        not 16K ones, at identical reconstruction."""
        n = 1 << 18  # 262144 cols; spread 2*70K+1K > SW_MAX
        a = sp.lil_matrix((n, n))
        a.setdiag(2.0 * np.ones(n))
        step = 70000
        rows = np.arange(n - 2 * step)
        a[rows, rows + step] = 0.5
        a[rows, rows + 2 * step] = 0.25
        csr = sp.csr_matrix(a)
        A = PellMatrix.from_scipy(csr, tile=1024, encoding="unit",
                                  device=False)
        assert A.sw <= 4096, (A.sw, A.n_win)  # not the old fixed 16K
        assert A.n_win <= 5
        x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        got = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(got, csr @ x, rtol=2e-5, atol=2e-5)

    def test_kernel_seam_dtype(self):
        """Round-5: the kernel runs at the PLANE dtype; an f64 caller
        (x64 probes like normest) gets an f64 result computed through
        the f32 kernel — never an f64 Pallas trace."""
        n = 1024
        a = sp.diags([np.ones(n - 1), 2.0 * np.ones(n), np.ones(n - 1)],
                     [-1, 0, 1]).tocsr().astype(np.float32)
        A = PellMatrix.from_scipy(a, tile=256, encoding="grouped",
                                  device=False)
        assert A.vals.dtype == np.float32
        x64 = jnp.asarray(np.random.default_rng(1).standard_normal(n))
        assert x64.dtype == jnp.float64  # conftest enables x64
        y = pell_apply(A, x64, interpret=True)
        assert y.dtype == jnp.float64
        np.testing.assert_allclose(
            np.asarray(y), a @ np.asarray(x64), rtol=2e-5, atol=2e-5
        )

    def test_window_overflow_raises(self):
        # One row touching chunks all over the matrix: needs more windows
        # than max_windows allows.
        n = 8192
        cols = np.arange(0, n, 1024)
        a = sp.csr_matrix(
            (np.ones(len(cols)), (np.zeros(len(cols)), cols)), shape=(n, n)
        ) + sp.eye(n)
        with pytest.raises(ValueError, match="window overflow"):
            PellMatrix.from_scipy(a.tocsr(), tile=1024, sw=1024, max_windows=2)


class TestGroupedEncoding:
    """Grouped (two-spread-4-window, per-element) encoding: round-trip,
    interpret-mode kernel parity, and the K reduction that motivates it
    (ops/pell.py module docstring, exp/pell_probe3.py)."""

    def _patterns(self):
        n = 2048
        rng = np.random.default_rng(3)
        o = np.ones(n)
        ring = sp.diags([o, o, 4 * o, o, o], [-2, -1, 0, 1, 2], (n, n)).tolil()
        ring[0, n - 1] = ring[n - 1, 0] = 1.0
        ring[0, n - 2] = ring[n - 2, 0] = 1.0
        m = 12
        d1 = sp.diags([1.0, 1.0, 1.0], [-1, 0, 1], (m, m))
        lap27 = sp.kron(sp.kron(d1, d1), d1) / 27.0
        return {
            "banded": random_banded(n, 8, 4, 0),
            "ring": ring.tocsr(),
            "lap27": lap27.tocsr(),
        }

    def test_roundtrip(self):
        for name, a in self._patterns().items():
            a = sp.csr_matrix(a).astype(np.float32)
            A = PellMatrix.from_scipy(a, tile=1024, encoding="grouped",
                                      device=False)
            assert A.enc == "grouped"
            np.testing.assert_allclose(A.to_dense(), a.toarray(), atol=0,
                                       err_msg=name)

    def test_matvec_and_powers_parity(self):
        for name, a in self._patterns().items():
            a = sp.csr_matrix(a).astype(np.float32)
            n = a.shape[0]
            A = PellMatrix.from_scipy(a, tile=1024, encoding="grouped")
            x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
            y = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
            y_ref = a @ x
            scale = max(np.max(np.abs(y_ref)), 1e-30)
            np.testing.assert_allclose(y / scale, y_ref / scale, atol=1e-6,
                                       err_msg=name)
            V = np.asarray(matrix_powers_pell(A, jnp.asarray(x), 3,
                                              interpret=True))
            v = x.copy()
            for k in range(1, 4):
                v = a @ v
                s = max(np.max(np.abs(v)), 1e-30)
                np.testing.assert_allclose(V[:, k] / s, v / s, atol=2e-6,
                                           err_msg=f"{name} power {k}")

    def test_k_reduction(self):
        """The grouped encoding needs fewer slots on the benchmark
        patterns (the whole point: less HBM traffic + cheaper loop)."""
        for name, a in self._patterns().items():
            a = sp.csr_matrix(a).astype(np.float32)
            Au = PellMatrix.from_scipy(a, tile=1024, encoding="unit",
                                       device=False)
            Ag = PellMatrix.from_scipy(a, tile=1024, encoding="grouped",
                                       device=False)
            assert Ag.k_slots <= Au.k_slots, name

    def test_auto_picks_lower_traffic(self):
        a = sp.csr_matrix(self._patterns()["ring"]).astype(np.float32)
        A = PellMatrix.from_scipy(a, tile=1024, encoding="auto", device=False)
        # ring: K 16 -> 8 at a cheaper measured slot cost, so auto must
        # pick a grouped geometry (_ENC_SLOT_COST pricing)
        assert A.enc in ("grouped", "grouped4")
        np.testing.assert_allclose(A.to_dense(), a.toarray(), atol=0)


class TestKernelInterpret:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matvec_matches_dense(self, seed):
        n = 2000
        a = random_banded(n, 300, 7, seed)
        A = PellMatrix.from_scipy(a, tile=1024, cmax=8)
        x = np.random.default_rng(seed + 10).standard_normal(n)
        y = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(y, a @ x, rtol=1e-12, atol=1e-12)

    def test_matvec_asymmetric_scattered(self):
        n = 1024
        rng = np.random.default_rng(3)
        a = sp.random(n, n, density=0.01, random_state=3, format="csr")
        a = a + sp.eye(n)
        A = PellMatrix.from_scipy(a.tocsr(), tile=512, cmax=8)
        x = rng.standard_normal(n)
        y = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(y, a @ x, rtol=1e-12, atol=1e-12)

    def test_recurrence_coefficients(self):
        n = 1200
        a = random_banded(n, 200, 5, 5)
        A = PellMatrix.from_scipy(a, tile=1024)
        rng = np.random.default_rng(6)
        x = rng.standard_normal(n)
        vp = rng.standard_normal(n)
        d, sb = 0.7, -0.3
        y = np.asarray(
            pell_apply(A, jnp.asarray(x), jnp.asarray(vp), d, sb, interpret=True)
        )
        np.testing.assert_allclose(y, a @ x - d * x - sb * vp, rtol=1e-12, atol=1e-12)

    def test_matrix_powers_monomial(self):
        n = 1024
        a = random_banded(n, 100, 5, 7)
        a = (a + a.T) * 0.05  # keep powers bounded
        A = PellMatrix.from_scipy(sp.csr_matrix(a), tile=512)
        x = np.random.default_rng(8).standard_normal(n)
        s = 4
        V = np.asarray(matrix_powers_pell(A, jnp.asarray(x), s, interpret=True))
        ad = a.toarray()
        expect = np.stack(
            [np.linalg.matrix_power(ad, k) @ x for k in range(s + 1)], axis=1
        )
        np.testing.assert_allclose(V, expect, rtol=1e-10, atol=1e-10)

    def test_matvec_periodic_wrap_multiwindow(self):
        """Ring-periodic FD operator: wrap entries (|col-row| = n-2) force
        a second x-span window per edge tile — the motivating multi-window
        case (the reference's runLanczos Hamiltonian is periodic,
        runLanczos.m:15-18)."""
        n = 8192
        main = 2.0 * np.ones(n)
        off = -1.0 * np.ones(n - 1)
        a = sp.diags([off, main, off], [-1, 0, 1]).tolil()
        a[0, n - 1] = -1.0
        a[n - 1, 0] = -1.0
        a = sp.csr_matrix(a)
        A = PellMatrix.from_scipy(a, tile=1024, sw=2048)
        assert A.n_win >= 2
        x = np.random.default_rng(12).standard_normal(n)
        y = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(y, a @ x, rtol=1e-12, atol=1e-12)

    def test_matvec_scattered_clusters_multiwindow(self):
        """Arrow-plus-band sparsity: every tile couples to the first block
        column AND its own diagonal neighborhood."""
        n = 6144
        rng = np.random.default_rng(13)
        a = random_banded(n, 100, 4, 13).tolil()
        for i in range(0, n, 17):  # arrow: scattered couplings to cols 0..63
            a[i, int(rng.integers(0, 64))] = rng.standard_normal()
        a = sp.csr_matrix(a)
        A = PellMatrix.from_scipy(a, tile=1024, sw=1024)
        assert A.n_win >= 2
        x = rng.standard_normal(n)
        y = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(y, a @ x, rtol=1e-12, atol=1e-12)

    def test_matrix_powers_multiwindow(self):
        n = 4096
        a = sp.diags(
            [np.full(n - 1, -0.05), np.full(n, 0.1), np.full(n - 1, -0.05)],
            [-1, 0, 1],
        ).tolil()
        a[0, n - 1] = -0.05
        a[n - 1, 0] = -0.05
        a = sp.csr_matrix(a)
        A = PellMatrix.from_scipy(a, tile=1024, sw=1024)
        assert A.n_win >= 2
        x = np.random.default_rng(14).standard_normal(n)
        s = 4
        V = np.asarray(matrix_powers_pell(A, jnp.asarray(x), s, interpret=True))
        ad = a.toarray()
        expect = np.stack(
            [np.linalg.matrix_power(ad, k) @ x for k in range(s + 1)], axis=1
        )
        np.testing.assert_allclose(V, expect, rtol=1e-10, atol=1e-10)

    def test_matrix_powers_newton_coeffs(self):
        n = 1024
        a = random_banded(n, 100, 5, 9)
        a = (a + a.T) * 0.05
        A = PellMatrix.from_scipy(sp.csr_matrix(a), tile=512)
        rng = np.random.default_rng(10)
        x = rng.standard_normal(n)
        s = 3
        diag = rng.standard_normal(s) * 0.1
        sub = rng.standard_normal(s) * 0.1
        V = np.asarray(
            matrix_powers_pell(A, jnp.asarray(x), s, diag, sub, interpret=True)
        )
        ad = a.toarray()
        expect = [x, ad @ x - diag[0] * x]
        for k in range(1, s):
            expect.append(ad @ expect[k] - diag[k] * expect[k] - sub[k] * expect[k - 1])
        np.testing.assert_allclose(V, np.stack(expect, 1), rtol=1e-10, atol=1e-10)


class TestPellInSolvers:
    def test_ca_lanczos_on_pell_matches_dense(self):
        """PELL rides the matrix_powers dispatch: the CA-Lanczos driver on
        a PellMatrix must match the dense-operator run."""
        import jax.numpy as jnp
        from ca_lanczos_tpu.config import Basis, Orth
        from ca_lanczos_tpu.ops.spmv import DenseMatrix
        from ca_lanczos_tpu.solvers.ca_lanczos import ca_lanczos

        n = 512
        a = random_banded(n, 60, 5, 11)
        a = sp.csr_matrix((a + a.T) * 0.5 + sp.eye(n) * 5.0)
        Ap = PellMatrix.from_scipy(a, tile=256)
        Ad = DenseMatrix(a=jnp.asarray(a.toarray()))
        r = jnp.ones(n)
        res_p = ca_lanczos(Ap, r, 4, 24, basis=Basis.MONOMIAL, orth=Orth.FULL)
        res_d = ca_lanczos(Ad, r, 4, 24, basis=Basis.MONOMIAL, orth=Orth.FULL)
        d_p = np.sort(np.linalg.eigvalsh(res_p.T))
        d_d = np.sort(np.linalg.eigvalsh(res_d.T))
        np.testing.assert_allclose(d_p, d_d, rtol=1e-9, atol=1e-9)


class TestGroupedFallback:
    @pytest.mark.slow
    def test_wide_cluster_falls_back_to_unit(self):
        """A single row touching a contiguous >8-chunk cluster cannot be
        grouped (two spread-4 windows max); encoding='auto' must fall
        back to the unit encoding, not crash (round-2 regression: the
        grouped packer emitted an empty slot-tile and IndexError'd)."""
        n = 2048
        a = sp.lil_matrix((n, n))
        a.setdiag(2.0 * np.ones(n))
        a[5, 100:100 + 10 * 128:1] = 1.0  # 10 consecutive chunks in row 5
        csr = sp.csr_matrix(a)
        A = PellMatrix.from_scipy(csr, tile=256, encoding="auto")
        assert A.enc == "unit"
        x = np.random.default_rng(0).standard_normal(n)
        got = np.asarray(pell_apply(A, jnp.asarray(x, jnp.float32), interpret=True))
        np.testing.assert_allclose(got, csr @ x, rtol=1e-5, atol=1e-5)


class TestGrouped4:
    """Four-spread-2-window grouped encoding (round-5 VERDICT item 5):
    the 216^3-class failure — three z-plane chunk clusters per slot-tile
    on multi-window tiles — made the 2-window packing inflate K2 to the
    unit encoding's price (auto fell back, -35%).  Four spread-2 windows
    strictly generalize the 2x4 cover (split each window) and pack all
    three clusters into one slot-tile."""

    def _lap27(self, g):
        n = g ** 3
        offs = [dz * g * g + dy * g + dx
                for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)]
        mats, ks = [], []
        for o in offs:
            if o == 0:
                mats.append(26.0 * np.ones(n)); ks.append(0)
            else:
                mats.append(-np.ones(n - abs(o))); ks.append(o)
        return sp.csr_matrix(sp.diags(mats, ks, (n, n))).astype(np.float32)

    def test_parity_small(self):
        """Dense reconstruction + interpret matvec on a multi-cluster
        pattern, both encoders."""
        a = self._lap27(16)
        ad = a.toarray()
        x = np.random.default_rng(0).standard_normal(a.shape[0]).astype(np.float32)
        for native in (False, True):
            A = PellMatrix.from_scipy(a, encoding="grouped4", sw=1024,
                                      native=native, device=False)
            assert A.enc == "grouped4"
            assert np.abs(A.to_dense() - ad).max() == 0.0
            got = np.asarray(pell_apply(A, jnp.asarray(x), interpret=True))
            np.testing.assert_allclose(got, ad @ x, rtol=2e-5, atol=2e-4)

    @pytest.mark.slow
    def test_multiwindow_k_reduction_and_auto_pick(self):
        """On the multi-window 27-pt pattern the 4-window form reaches
        the ideal K=32 (2-window: 40, unit: 48) and auto now selects it
        instead of falling back to unit."""
        a = self._lap27(64)
        Ks = {}
        for enc in ("unit", "grouped", "grouped4", "auto"):
            A = PellMatrix.from_scipy(a, encoding=enc, sw=4096,
                                      device=False)
            Ks[enc] = (A.enc, A.k_slots)
        assert Ks["grouped4"] == ("grouped4", 32), Ks
        assert Ks["auto"][0] == "grouped4", Ks
        assert Ks["grouped4"][1] < Ks["grouped"][1] < Ks["unit"][1], Ks

    def test_grouped4_subsumes_grouped(self):
        """Any 2x4-coverable chunk set is 4x2-coverable: grouped4 must
        encode every pattern grouped encodes (banded + ring wrap)."""
        n = 1024
        o = np.ones(n)
        ring = sp.diags([2 * o, o[:-1], o[:-1]], [0, -1, 1]).tolil()
        ring[0, n - 1] = 1.0
        ring[n - 1, 0] = 1.0
        for pat in (sp.diags([1.0, -4.0, 6.0, -4.0, 1.0],
                             [-2, -1, 0, 1, 2], (n, n)), ring):
            csr = sp.csr_matrix(pat)
            A2 = PellMatrix.from_scipy(csr, tile=256, encoding="grouped",
                                       device=False)
            A4 = PellMatrix.from_scipy(csr, tile=256, encoding="grouped4",
                                       device=False)
            x = np.random.default_rng(1).standard_normal(n)
            for A in (A2, A4):
                got = np.asarray(
                    pell_apply(A, jnp.asarray(x, jnp.float32), interpret=True)
                )
                np.testing.assert_allclose(got, csr @ x, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
class TestEncodingSweepCorpusPatterns:
    """Every encoding (unit/grouped/auto) must reproduce the matrix
    exactly across the corpus's sparsity families — the grouped packer's
    wide-cluster fallback bug showed structural edge cases hide in
    pattern diversity, not size."""

    def _patterns(self):
        rng = np.random.default_rng(11)
        n = 1024
        pats = {}
        o = np.ones(n)
        pats["tridiag"] = sp.diags([-o[:-1], 2 * o, -o[:-1]], [-1, 0, 1])
        pats["beam4"] = sp.diags([1.0, -4.0, 6.0, -4.0, 1.0],
                                 [-2, -1, 0, 1, 2], (n, n))
        nx = 32
        t = sp.diags([-1, 2, -1], [-1, 0, 1], (nx, nx))
        pats["mesh2d"] = sp.kron(sp.eye(nx), t) + sp.kron(t, sp.eye(nx))
        pats["band_random"] = random_banded(n, 16, 6, 3)
        # ring-periodic pentadiagonal (wrap columns -> far cluster)
        ring = sp.diags([2 * o, o[:-1], o[:-1]], [0, -1, 1]).tolil()
        ring[0, n - 1] = 1.0
        ring[n - 1, 0] = 1.0
        pats["ring"] = ring
        # arrow: dense first row/col + band
        arrow = sp.lil_matrix((n, n))
        arrow.setdiag(2 * np.ones(n))
        arrow[0, :] = 0.01
        arrow[:, 0] = 0.01
        arrow[0, 0] = 2.0
        pats["arrow"] = arrow
        return {k: sp.csr_matrix(v) for k, v in pats.items()}

    @pytest.mark.parametrize("enc", ["unit", "grouped", "grouped4", "auto"])
    def test_matvec_parity_all_patterns(self, enc):
        rng = np.random.default_rng(5)
        for name, csr in self._patterns().items():
            csr.sum_duplicates()
            try:
                A = PellMatrix.from_scipy(csr, tile=256, encoding=enc)
            except ValueError as e:
                if enc in ("grouped", "grouped4"):
                    # forcing grouped may legitimately fail (e.g. the
                    # arrow's dense row exceeds the two spread-4
                    # windows); "auto" must fall back instead
                    assert "grouped" in str(e)
                    continue
                pytest.fail(f"{name}/{enc} rejected: {e}")
            x = rng.standard_normal(csr.shape[0])
            got = np.asarray(
                pell_apply(A, jnp.asarray(x, jnp.float32), interpret=True)
            )
            np.testing.assert_allclose(
                got, csr @ x, rtol=2e-5, atol=2e-5,
                err_msg=f"{name} enc={enc} (landed enc={A.enc})",
            )
