"""L1: TSQR / CholQR / project / normalize / project_and_normalize."""

import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu import cholqr, normalize, project, project_and_normalize, tsqr
from ca_lanczos_tpu.config import OrthParams
from ca_lanczos_tpu.ops.qr import cholqr2

def _rng(seed):
    """Per-call-site generators (xdist-scheduling determinism; see
    tests/test_spmv.py round-5 note)."""
    return np.random.default_rng(seed)


def _tall(n=200, m=6, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((n, m)))


class TestTsqr:
    def test_factorization(self):
        X = _tall()
        Q, R = tsqr(X)
        np.testing.assert_allclose(np.asarray(Q) @ np.asarray(R), np.asarray(X), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(Q).T @ np.asarray(Q), np.eye(6), atol=1e-13
        )

    def test_positive_diagonal(self):
        """Sign convention diag(R) >= 0 (tsqr.m:9-11)."""
        for seed in range(5):
            _, R = tsqr(_tall(seed=seed))
            assert np.all(np.diag(np.asarray(R)) >= 0)

    def test_complex(self):
        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.standard_normal((50, 4)) + 1j * rng.standard_normal((50, 4)))
        Q, R = tsqr(X)
        np.testing.assert_allclose(np.asarray(Q) @ np.asarray(R), np.asarray(X), atol=1e-12)
        assert np.all(np.real(np.diag(np.asarray(R))) >= 0)


class TestCholqr:
    def test_factorization(self):
        X = _tall(seed=2)
        Q, R = cholqr(X)
        np.testing.assert_allclose(np.asarray(Q) @ np.asarray(R), np.asarray(X), atol=1e-10)
        np.testing.assert_allclose(np.asarray(Q).T @ np.asarray(Q), np.eye(6), atol=1e-10)
        assert np.allclose(np.tril(np.asarray(R), -1), 0)

    def test_cholqr2_orthogonality(self):
        # Moderately ill-conditioned block: CholQR2 restores orthogonality.
        n, m = 300, 8
        U = np.linalg.qr(_rng(500).standard_normal((n, m)))[0]
        S = np.logspace(0, -6, m)
        X = jnp.asarray(U * S)
        Q, R = cholqr2(X)
        np.testing.assert_allclose(np.asarray(Q).T @ np.asarray(Q), np.eye(m), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Q) @ np.asarray(R), np.asarray(X), atol=1e-10)


class TestNormalize:
    def test_full_rank(self):
        X = _tall(seed=3)
        Q, R, rank = normalize(X)
        assert rank == 6
        np.testing.assert_allclose(np.asarray(Q) @ R, np.asarray(X), atol=1e-12)

    def test_rank_detection(self):
        n, m = 100, 5
        base = np.random.default_rng(4).standard_normal((n, 3))
        X = np.column_stack([base, base[:, 0] + base[:, 1], base[:, 2] * 2])
        _, _, rank = normalize(jnp.asarray(X))
        assert rank == 3

    def test_randomize_null_space(self):
        n, m = 100, 5
        base = np.random.default_rng(5).standard_normal((n, 3))
        X = np.column_stack([base, base[:, 0], base[:, 1]])
        Q, R, rank = normalize(jnp.asarray(X), randomize=True, key=jnp.zeros(2, jnp.uint32))
        assert rank == 3
        # All 5 columns orthonormal after randomization (normalize.m:38-51).
        G = np.asarray(Q).T @ np.asarray(Q)
        np.testing.assert_allclose(G, np.eye(5), atol=1e-10)


class TestProject:
    def test_single_block(self):
        Q, _ = tsqr(_tall(seed=6))
        X = _tall(seed=7)
        Y, Rs = project([Q], X)
        np.testing.assert_allclose(np.asarray(Q).T @ np.asarray(Y), 0, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(Q) @ Rs[0] + np.asarray(Y), np.asarray(X), atol=1e-12
        )

    def test_multi_block_sequential(self):
        Q1, _ = tsqr(_tall(seed=8))
        X2, _ = project([Q1], _tall(seed=9))
        Q2, _ = tsqr(X2)
        X = _tall(seed=10)
        Y, Rs = project([Q1, Q2], X)
        assert len(Rs) == 2
        np.testing.assert_allclose(np.asarray(Q1).T @ np.asarray(Y), 0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(Q2).T @ np.asarray(Y), 0, atol=1e-12)

    def test_empty_blocks(self):
        X = _tall(seed=11)
        Y, Rs = project([], X)
        np.testing.assert_allclose(np.asarray(Y), np.asarray(X))
        Y, Rs = project([None, jnp.zeros((200, 0))], X)
        np.testing.assert_allclose(np.asarray(Y), np.asarray(X))
        assert len(Rs) == 2 and Rs[0].shape == (0, 6)

    def test_vector_input(self):
        Q, _ = tsqr(_tall(seed=12))
        x = jnp.asarray(np.random.default_rng(13).standard_normal(200))
        y, Rs = project([Q], x)
        assert y.ndim == 1
        np.testing.assert_allclose(np.asarray(Q).T @ np.asarray(y), 0, atol=1e-12)
        assert Rs[0].shape == (6, 1)

    def test_reference_second_pass_trigger(self):
        """The reference trigger (project.m:44-46) fires when no column
        collapsed; the conventional one when some column did."""
        Q, _ = tsqr(_tall(seed=14))
        X = _tall(seed=15)  # generic X: norms barely drop
        # Reference: second pass should run -> R accumulates both passes,
        # and Y is (even more) orthogonal. Behavior check: both settings
        # produce a projected Y orthogonal to Q.
        for ref in (True, False):
            params = OrthParams(reference_second_pass=ref)
            Y, Rs = project([Q], X, reorth=True, params=params)
            np.testing.assert_allclose(np.asarray(Q).T @ np.asarray(Y), 0, atol=1e-12)
            np.testing.assert_allclose(
                np.asarray(Q) @ Rs[0] + np.asarray(Y), np.asarray(X), atol=1e-12
            )


class TestProjectAndNormalize:
    def test_basic(self):
        Q1, _ = tsqr(_tall(seed=16))
        X = _tall(seed=17)
        res = project_and_normalize([Q1], X)
        Qn = np.asarray(res.Q)
        np.testing.assert_allclose(Qn.T @ Qn, np.eye(6), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Q1).T @ Qn, 0, atol=1e-12)
        # Reconstruction: X = Q1 R_blocks[0] + Q R.
        np.testing.assert_allclose(
            np.asarray(Q1) @ res.R_blocks[0] + Qn @ res.R, np.asarray(X), atol=1e-11
        )

    def test_second_pass_on_near_dependence(self):
        """Columns nearly inside span(Q1) must trigger the 50%-drop second
        pass (projectAndNormalize.m:43-57) and still come out orthogonal."""
        Q1, _ = tsqr(_tall(seed=18))
        noise = np.random.default_rng(19).standard_normal((200, 3))
        X = jnp.asarray(np.asarray(Q1)[:, :3] + 1e-6 * noise)
        res = project_and_normalize([Q1], X)
        assert res.second_pass
        Qn = np.asarray(res.Q)
        np.testing.assert_allclose(Qn.T @ Qn, np.eye(3), atol=1e-8)
        np.testing.assert_allclose(np.asarray(Q1).T @ Qn, 0, atol=1e-7)

    def test_no_blocks(self):
        X = _tall(seed=20)
        res = project_and_normalize([], X)
        Qn = np.asarray(res.Q)
        np.testing.assert_allclose(Qn.T @ Qn, np.eye(6), atol=1e-12)
        np.testing.assert_allclose(Qn @ res.R, np.asarray(X), atol=1e-11)
