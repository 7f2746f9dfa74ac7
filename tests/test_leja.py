"""L2: Leja orderings, multiplicities, Newton change-of-basis matrix."""

import numpy as np
import pytest

from ca_lanczos_tpu import LejaVariant, count_multiplicities, leja, newton_basis_matrix
from ca_lanczos_tpu.basis.leja import (
    complex_leja,
    modified_leja,
    nonmodified_leja,
    real_leja,
)


class TestMultiplicities:
    def test_unique(self):
        y, m = count_multiplicities([3.0, 1.0, 2.0])
        assert sorted(y) == [1.0, 2.0, 3.0]
        np.testing.assert_array_equal(m, [1, 1, 1])

    def test_repeats(self):
        y, m = count_multiplicities([2.0, 1.0, 2.0, 2.0, 1.0])
        d = dict(zip(y.tolist(), m.tolist()))
        assert d == {1.0: 2, 2.0: 3}


class TestNonmodifiedLeja:
    def test_starts_at_max_modulus(self):
        x = np.array([1.0, -5.0, 3.0, 0.5])
        y, idx = nonmodified_leja(x)
        assert y[0] == -5.0
        np.testing.assert_allclose(x[idx], y)

    def test_permutation(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(12)
        y, idx = nonmodified_leja(x)
        assert sorted(idx.tolist()) == list(range(12))
        np.testing.assert_allclose(np.sort(y), np.sort(x), rtol=1e-12)

    def test_greedy_property(self):
        """Each selected point maximizes the product of distances to the
        already-selected set (the defining Leja property)."""
        rng = np.random.default_rng(1)
        x = rng.uniform(-10, 10, 9)
        y, _ = nonmodified_leja(x)
        for k in range(1, len(y)):
            chosen = np.prod(np.abs(y[k] - y[:k]))
            for cand in y[k + 1 :]:
                assert chosen >= np.prod(np.abs(cand - y[:k])) - 1e-9 * chosen

    def test_repeated_shifts_raise(self):
        with pytest.raises(ValueError):
            nonmodified_leja(np.array([1.0, 1.0, 2.0]))

    def test_large_spread_capacity_scaling(self):
        """Capacity rescaling keeps products finite for wide spectra
        (nonmodified_leja.m:52-71)."""
        x = np.linspace(1.0, 1e8, 60)
        y, idx = nonmodified_leja(x)
        assert np.isfinite(y).all()
        np.testing.assert_allclose(np.sort(y), np.sort(x), rtol=1e-10)


class TestModifiedLeja:
    def test_real_points_match_nonmodified_order(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(10)
        y1, _ = nonmodified_leja(x)
        y2, _ = modified_leja(x)
        np.testing.assert_allclose(y1, y2, rtol=1e-10)

    def test_conjugate_pairs_stay_adjacent(self):
        x = np.array([2.0 + 1j, 2.0 - 1j, -3.0, 0.5 + 2j, 0.5 - 2j, 1.0])
        y, idx = modified_leja(x)
        k = 0
        while k < len(y):
            if y[k].imag != 0:
                assert y[k].imag > 0
                assert y[k + 1] == np.conj(y[k])
                k += 2
            else:
                k += 1

    def test_out_of_order_pair_raises(self):
        x = np.array([2.0 - 1j, 2.0 + 1j, 5.0])
        with pytest.raises(ValueError):
            modified_leja(x)


class TestRealLeja:
    def test_uniquifies(self):
        x = np.array([3.0, 1.0, 3.0, 2.0, 1.0])
        y, _ = real_leja(x)
        assert len(y) == 3
        np.testing.assert_allclose(np.sort(y), [1.0, 2.0, 3.0])

    def test_normalizes_pair_order(self):
        x = np.array([1.0 - 2j, 1.0 + 2j, 5.0, -4.0])
        y, _ = real_leja(x)
        for k in range(len(y)):
            if y[k].imag < 0:
                assert y[k - 1] == np.conj(y[k])


class TestComplexLeja:
    def test_permutation_and_start(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(8) + 1j * rng.standard_normal(8)
        y, idx = complex_leja(x)
        assert np.isclose(abs(y[0]), np.max(np.abs(x)))
        np.testing.assert_allclose(x[idx], y)


class TestLejaDispatcher:
    def test_variants(self):
        x = np.array([1.0, 5.0, -3.0, 2.0])
        for v in LejaVariant:
            y = leja(x, v)
            np.testing.assert_allclose(np.sort(np.real(y)), np.sort(x), rtol=1e-10)


class TestNewtonBasisMatrix:
    def test_plain(self):
        B = newton_basis_matrix([1.0, 2.0, 3.0], 3)
        assert B.shape == (4, 3)
        np.testing.assert_allclose(np.diag(B), [1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.diag(B, -1), [1.0, 1.0, 1.0])

    def test_modified_conj_pair(self):
        shifts = np.array([1.0 + 2j, 1.0 - 2j, 0.5])
        B = newton_basis_matrix(shifts, 3, modified=True)
        assert not np.iscomplexobj(B)
        np.testing.assert_allclose(np.diag(B), [1.0, 1.0, 0.5])
        # -imag^2 on the superdiagonal of the negative-imag member
        # (newton_basis_matrix.m:53).
        assert B[0, 1] == -4.0

    def test_modified_broken_pair_raises(self):
        with pytest.raises(ValueError):
            newton_basis_matrix(np.array([1.0 + 2j, 3.0, 0.5]), 3, modified=True)

    def test_negative_imag_first_raises(self):
        with pytest.raises(ValueError):
            newton_basis_matrix(np.array([1.0 - 2j, 1.0 + 2j]), 2, modified=True)
