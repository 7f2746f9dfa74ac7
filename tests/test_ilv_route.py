"""Production wiring of the interleaved (ILV) carrier: make_operator
routing, OperatorRoute pad/perm round-trip, and the fused one-XLA-call
driver riding the ilv powers kernel (VERDICT r2 item 1).

Reference seams: SpMV.m:1-9 (format extension point),
restarted_ca_lanczos.m:83-181 (the flagship loop the kernel serves).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ca_lanczos_tpu.ops.formats import make_operator, negate_operator
from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix


def banded_csr(n, w=2, seed=0, dtype=np.float32):
    """Symmetric banded matrix with a separated top eigenvalue cluster."""
    rng = np.random.default_rng(seed)
    diags = [rng.standard_normal(n).astype(dtype) * 0.1 for _ in range(w)]
    main = np.linspace(1.0, 2.0, n).astype(dtype)
    mats = [sp.diags(main)]
    for k, d in enumerate(diags, start=1):
        mats.append(sp.diags(d[: n - k], k))
        mats.append(sp.diags(d[: n - k], -k))
    return sum(mats).tocsr()


class TestIlvRoute:
    def test_forced_route_and_roundtrip(self):
        n = 10_000  # pads to 16384
        a = banded_csr(n)
        A, route = make_operator(a, prefer="ilv")
        assert isinstance(A, IlvDiaMatrix)
        assert route.format == "ilv"
        assert route.n_orig == n
        assert A.n == 16384 and len(route.perm) == 16384
        rng = np.random.default_rng(1)
        x = rng.standard_normal(n).astype(np.float32)
        np.testing.assert_array_equal(route.restore(route.apply(x)), x)
        # matvec through the route == scipy matvec (pad rows carry the
        # Gershgorin-mid diagonal; zero-padded vectors never see it)
        y = route.restore(np.asarray(A.matvec(jnp.asarray(route.apply(x)))))
        np.testing.assert_allclose(y, a @ x, rtol=2e-5, atol=2e-5)

    def test_auto_stays_dia_on_cpu(self):
        # auto never upgrades on the CPU backend: plain DiaMatrix
        a = banded_csr(10_000)
        A, route = make_operator(a)
        assert route.format == "dia"

    def test_negate_ilv(self):
        a = banded_csr(8192 * 2)
        A, route = make_operator(a, prefer="ilv")
        B = negate_operator(A)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal(A.n), jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(B.matvec(x)), -np.asarray(A.matvec(x)), rtol=1e-6
        )

    def test_save_load_roundtrip(self, tmp_path):
        from ca_lanczos_tpu.ops.formats import load_operator_npz, save_operator

        a = banded_csr(8192 * 2)
        A, route = make_operator(a, prefer="ilv")
        p = str(tmp_path / "op.npz")
        save_operator(p, A, route)
        A2, route2 = load_operator_npz(p)
        assert isinstance(A2, IlvDiaMatrix) and A2.tq == A.tq
        assert route2.n_orig == route.n_orig
        np.testing.assert_array_equal(np.asarray(A2.dflat), np.asarray(A.dflat))
        np.testing.assert_array_equal(route2.perm, route.perm)


class TestDistIlv:
    def test_dist_powers_ride_ilv(self):
        """Per-shard ilv layout matches the XLA-scan distributed powers
        (8-way virtual mesh, interpret kernel)."""
        from ca_lanczos_tpu.ops.spmv import DiaMatrix
        from ca_lanczos_tpu.parallel import make_mesh
        from ca_lanczos_tpu.parallel.distributed import (
            DistDia, dist_matrix_powers,
        )

        mesh = make_mesh(8)
        n, s = 8 * 1024, 4
        rng = np.random.default_rng(11)
        data = (rng.standard_normal((3, n)) * 0.3).astype(np.float32)
        A = DiaMatrix(data=jnp.asarray(data), offsets=(-1, 0, 1))
        x = rng.standard_normal(n).astype(np.float32)
        z = jnp.zeros(s, jnp.float32)

        A_scan = DistDia.from_dia(A, mesh, s_max=s)
        xs = A_scan.shard_vector(x, mesh)
        V_scan = np.asarray(dist_matrix_powers(A_scan, xs, s, z, z, mesh))[:n]

        A_ilv = DistDia.from_dia(A, mesh, s_max=s, interpret=True, ilv=True)
        assert A_ilv.ilv_dflat is not None
        V_ilv = np.asarray(dist_matrix_powers(A_ilv, xs, s, z, z, mesh))[:n]
        np.testing.assert_allclose(V_ilv, V_scan, rtol=2e-5, atol=2e-5)

    def test_dist_block_step_rides_ilv(self):
        """The jitted CA block step (powers + CGS + TSQR) on the
        ilv-carrying operator matches the scan operator."""
        from ca_lanczos_tpu.ops.spmv import DiaMatrix
        from ca_lanczos_tpu.parallel import make_mesh
        from ca_lanczos_tpu.parallel.distributed import DistDia
        from ca_lanczos_tpu.parallel.step import dist_first_block

        mesh = make_mesh(8)
        n, s = 8 * 1024, 4
        rng = np.random.default_rng(12)
        data = (rng.standard_normal((3, n)) * 0.3).astype(np.float32)
        A = DiaMatrix(data=jnp.asarray(data), offsets=(-1, 0, 1))
        q = rng.standard_normal(n).astype(np.float32)
        q /= np.linalg.norm(q)
        z = jnp.zeros(s, jnp.float32)

        A_scan = DistDia.from_dia(A, mesh, s_max=s)
        qs = A_scan.shard_vector(q, mesh)
        Q0, R0 = dist_first_block(A_scan, qs, z, z, s, mesh, "cholqr2")
        A_ilv = DistDia.from_dia(A, mesh, s_max=s, interpret=True, ilv=True)
        Q1, R1 = dist_first_block(A_ilv, qs, z, z, s, mesh, "cholqr2")
        np.testing.assert_allclose(
            np.asarray(R1), np.asarray(R0), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(Q1), np.asarray(Q0), rtol=2e-4, atol=2e-4
        )


class TestFusedOnIlv:
    @pytest.mark.slow
    def test_fused_restarted_rides_ilv(self):
        """The one-XLA-call driver on the carrier matches the plain
        DiaMatrix run (same spectrum, f32 verification floor)."""
        from ca_lanczos_tpu.ops.spmv import DiaMatrix
        from ca_lanczos_tpu.solvers.fused_restarted import (
            fused_restarted_ca_lanczos,
        )

        n = 16384
        vals = np.linspace(1.0, 100.0, n).astype(np.float32)
        vals[-5:] = [140, 150, 160, 170, 180]  # separated top pairs
        A = DiaMatrix(data=jnp.asarray(vals[None, :]), offsets=(0,))
        Ail = IlvDiaMatrix.from_dia(
            DiaMatrix(data=vals[None, :], offsets=(0,))
        )
        rng = np.random.default_rng(3)
        r = rng.standard_normal(n).astype(np.float32)
        from ca_lanczos_tpu.ops.pallas_ilv import ilv_encode

        res = fused_restarted_ca_lanczos(
            Ail, jnp.asarray(ilv_encode(r)), 24, n_wanted=5, s=4,
            basis="newton", tol=1e-5, max_restarts=40,
        )
        assert res.nconv >= 3
        locked = np.sort(res.eigs[np.isfinite(res.eigs)])[::-1]
        expect = np.array([180, 170, 160, 150, 140], np.float64)
        np.testing.assert_allclose(
            locked, expect[: len(locked)], rtol=5e-4
        )
