"""Communication cost model of the distributed layer (round-3 VERDICT
item 7): the matrix-powers block must communicate EXACTLY one halo
exchange — 2*halo*itemsize bytes per device — independent of s (that
independence IS the communication-avoiding trade, distributed.py:1-19),
and the Gram/TSQR reductions must be O(block^2), independent of n.

The volumes are asserted from the lowered jaxprs (ppermute / psum
operand shapes), not from docs — a regression that reintroduces per-step
exchanges fails here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ca_lanczos_tpu.parallel import make_mesh
from ca_lanczos_tpu.parallel.distributed import DistDia, dist_matrix_powers
from ca_lanczos_tpu.utils.matrices import laplacian_1d


def _collect(jaxpr, names, out):
    """Recursively collect (primitive, [operand shapes/dtypes]) for the
    named collectives from a jaxpr tree."""
    for eq in jaxpr.eqns:
        if eq.primitive.name in names:
            out.append(
                (eq.primitive.name,
                 [(tuple(v.aval.shape), np.dtype(v.aval.dtype).itemsize)
                  for v in eq.invars if hasattr(v.aval, "shape")])
            )
        for v in eq.params.values():
            for sub in jax.tree_util.tree_leaves(
                v, is_leaf=lambda x: hasattr(x, "eqns") or hasattr(x, "jaxpr")
            ):
                if hasattr(sub, "jaxpr"):
                    sub = sub.jaxpr
                if hasattr(sub, "eqns"):
                    _collect(sub, names, out)


def collective_bytes(fn, *args, names=("ppermute",)):
    """Total per-device operand bytes of the named collectives in fn's
    jaxpr, plus the call list."""
    jx = jax.make_jaxpr(fn)(*args)
    out = []
    _collect(jx.jaxpr, set(names), out)
    total = sum(
        int(np.prod(shape)) * isz for _, ops in out for shape, isz in ops
    )
    return total, out


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestHaloVolume:
    @pytest.mark.parametrize("s", [2, 4, 8])
    def test_one_exchange_per_block_volume_independent_of_s(self, mesh, s):
        """Per device: one fwd + one bwd halo send of s_max*w rows per
        s-step block — 2*halo*4 bytes, the SAME for every s <= s_max
        (one round per block, not per SpMV)."""
        n, s_max, w = 8 * 512, 8, 1
        A = DistDia.from_dia(laplacian_1d(n, dtype=jnp.float32), mesh,
                             s_max=s_max)
        x = A.shard_vector(np.ones(n, np.float32), mesh)
        z = jnp.zeros(s, jnp.float32)

        total, calls = collective_bytes(
            lambda xx: dist_matrix_powers(A, xx, s, z, z, mesh), x
        )
        assert len([c for c in calls if c[0] == "ppermute"]) == 2
        assert total == 2 * A.halo * 4

    @pytest.mark.parametrize("w", [1, 2, 4])
    def test_volume_linear_in_bandwidth(self, mesh, w):
        n, s = 8 * 512, 4
        rng = np.random.default_rng(0)
        offsets = tuple(range(-w, w + 1))
        data = (rng.standard_normal((len(offsets), n)) * 0.1).astype(np.float32)
        from ca_lanczos_tpu.ops.spmv import DiaMatrix

        A = DistDia.from_dia(DiaMatrix(data=jnp.asarray(data), offsets=offsets),
                             mesh, s_max=s)
        x = A.shard_vector(np.ones(n, np.float32), mesh)
        z = jnp.zeros(s, jnp.float32)
        total, _ = collective_bytes(
            lambda xx: dist_matrix_powers(A, xx, s, z, z, mesh), x
        )
        assert total == 2 * s * w * 4  # halo = s_max*w, s_max == s here

    def test_block_orth_reductions_independent_of_n(self, mesh):
        """The CA block step's psum traffic is O((s+1)^2) smalls — no
        n-sized collective anywhere in the block (the all-gather-free
        TSQR/Gram design, dist_orth.py)."""
        from ca_lanczos_tpu.parallel.step import dist_ca_block

        s = 4
        vols = []
        for n in (8 * 512, 8 * 1024):
            A = DistDia.from_dia(laplacian_1d(n, dtype=jnp.float32), mesh,
                                 s_max=s)
            Q = A.shard_vector(
                np.ones((n, s + 1), np.float32) / np.sqrt(n), mesh
            )
            z = jnp.zeros(s, jnp.float32)
            # "psum_invariant" is the psum primitive's jaxpr name in
            # current JAX — the old "psum" name collected nothing, which
            # silently weakened this test to ppermute-only (round-5 fix).
            total, calls = collective_bytes(
                lambda QQ: dist_ca_block(A, QQ, z, z, s, mesh), Q,
                names=("ppermute", "psum", "psum_invariant", "all_gather",
                       "all_reduce"),
            )
            assert any(name.startswith("psum") for name, _ in calls)
            # no collective operand may scale with n
            n_local = n // 8
            for name, ops in calls:
                for shape, _ in ops:
                    assert int(np.prod(shape)) < n_local, (name, shape, n)
            vols.append(total)
        assert vols[0] == vols[1], "reduction volume must not scale with n"
