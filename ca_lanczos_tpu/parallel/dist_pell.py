"""Row-sharded PELL operator: distributed general sparsity at Pallas
kernel speed.

``DistEll`` (dist_ell.py) distributes general bounded-bandwidth sparsity
but its local matvec is the XLA gather lowering (~0.1 Gnnz/s on TPU).
DistPell keeps DistEll's partitioning semantics — contiguous row blocks,
an s-hop matrix halo, one ppermute halo pair per s steps (SURVEY.md §7
"hard parts") — and encodes each shard's padded-window operator as a
PellMatrix, so the local recurrence steps run the one-gather unit-encoded
Pallas kernel (ops/pell.py) instead.  The reference seam is the same
``SpMV.m:1-5`` format-generality point.

All shards share the kernel statics (tile, K, W, sw): shards are encoded
independently, then padded to the maxima (zero value + binding-0 slots
are no-ops by construction).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec
from jax.tree_util import register_dataclass

from ca_lanczos_tpu.ops.pell import LANES, PellMatrix, _pell_step
from ca_lanczos_tpu.ops.spmv import EllMatrix
from ca_lanczos_tpu.parallel.dist_ell import ell_shard_planes
from ca_lanczos_tpu.parallel.distributed import RowStateMixin, _halo_exchange
from ca_lanczos_tpu.parallel.mesh import ROWS, RowAxes, row_axes, row_spec


@register_dataclass
@dataclasses.dataclass(frozen=True)
class DistPell(RowStateMixin):
    """Row-sharded PELL operator with an s-deep matrix halo.

    vals/lidx/cbase/span_row: per-shard PellMatrix planes stacked on a
    leading shard axis (see ops.pell.PellMatrix for the plane layouts);
    every shard encodes the (m x m) padded-window operator,
    m = n_local + 2*halo.
    """

    vals: jax.Array  # (P, ntiles*K, T)
    lidx: jax.Array  # (P, ntiles*K, T) int8
    cbase: jax.Array  # (P, ntiles_pad8, B*K) int32
    span_row: jax.Array  # (P, ntiles, W) int32
    halo: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))  # window rows
    tile: int = dataclasses.field(metadata=dict(static=True))
    k_slots: int = dataclasses.field(metadata=dict(static=True))
    sw: int = dataclasses.field(metadata=dict(static=True))
    n_win: int = dataclasses.field(metadata=dict(static=True))
    periodic: bool = dataclasses.field(default=False, metadata=dict(static=True))
    interpret: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Partition-time s bound (halo sized for s_max; see DistEll.s_max).
    s_max: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.vals.shape[0]

    @property
    def n_local(self) -> int:
        return self.m - 2 * self.halo

    @property
    def n_x(self) -> int:
        """Kernel x-buffer length for the (m x m) window operator."""
        ntiles = self.span_row.shape[1]
        return max(ntiles * self.tile, self.sw)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    @staticmethod
    def from_ell(
        A: EllMatrix,
        mesh: Mesh,
        s_max: int,
        periodic: bool = False,
        tile: int = 1024,
        max_windows: int = 16,
    ) -> "DistPell":
        """Partition an ELL operator and PELL-encode each shard's padded
        window.  Reuses DistEll's host-side plane partition
        (ell_shard_planes) for the bandwidth/halo/rebase semantics
        (including periodic ring windows) — numpy only, no device
        round-trip — then converts each shard's rebased ELL rows to a
        PellMatrix."""
        import scipy.sparse as sp

        vals, cols, halo, n = ell_shard_planes(
            A, mesh.devices.size, s_max, periodic
        )
        P_, m, kk = vals.shape

        shards = []
        rows = np.repeat(np.arange(m), kk).reshape(m, kk)
        for p in range(P_):
            v, c = vals[p], cols[p]
            mask = v != 0
            shards.append(
                sp.csr_matrix((v[mask], (rows[mask], c[mask])), shape=(m, m))
            )
        enc = [
            PellMatrix.from_scipy(csr, tile=tile, max_windows=max_windows,
                                  device=False)
            for csr in shards
        ]
        sw = max(e.sw for e in enc)
        enc = [
            e
            if e.sw == sw
            else PellMatrix.from_scipy(csr, tile=tile, sw=sw,
                                       max_windows=max_windows, device=False)
            for e, csr in zip(enc, shards)
        ]
        K = max(e.k_slots for e in enc)
        W = max(e.n_win for e in enc)
        ntiles = enc[0].ntiles
        B = tile // LANES
        ntiles_pad8 = 8 * (-(-ntiles // 8))
        # host_planes (set by PellMatrix.from_scipy) avoids fetching the
        # device planes back through the relay (minutes-slow per shard).
        planes = [getattr(e, "host_planes", None) or
                  tuple(np.asarray(x) for x in (e.vals, e.lidx, e.cbase, e.span_row))
                  for e in enc]
        dtype = planes[0][0].dtype

        sv = np.zeros((P_, ntiles * K, tile), dtype)
        sl = np.zeros((P_, ntiles * K, tile), np.int8)
        scb = np.zeros((P_, ntiles_pad8, B * K), np.int32)
        ssp = np.zeros((P_, ntiles, W), np.int64)
        for p, (e, (ev, el, ecb, esp)) in enumerate(zip(enc, planes)):
            Kp, Wp = e.k_slots, e.n_win
            sv[p].reshape(ntiles, K, tile)[:, :Kp] = ev.reshape(ntiles, Kp, tile)
            sl[p].reshape(ntiles, K, tile)[:, :Kp] = el.reshape(ntiles, Kp, tile)
            scb[p].reshape(ntiles_pad8, B, K)[:, :, :Kp] = ecb.reshape(
                ntiles_pad8, B, Kp
            )
            ssp[p, :, :Wp] = esp
            ssp[p, :, Wp:] = esp[:, -1:]

        sharding = NamedSharding(mesh, row_spec(mesh))
        return DistPell(
            vals=jax.device_put(jnp.asarray(sv), sharding),
            lidx=jax.device_put(jnp.asarray(sl), sharding),
            cbase=jax.device_put(jnp.asarray(scb), sharding),
            span_row=jax.device_put(jnp.asarray(ssp, jnp.int32), sharding),
            halo=halo,
            n=n,
            m=m,
            tile=tile,
            k_slots=K,
            sw=sw,
            n_win=W,
            periodic=periodic,
            interpret=jax.default_backend() != "tpu",
            s_max=s_max,
        )

    def shard_vector(self, x, mesh: Mesh) -> jax.Array:
        x = np.asarray(x)
        n_pad = self.n_shards * self.n_local
        xp = np.zeros((n_pad,) + x.shape[1:], x.dtype)
        xp[: self.n] = x
        return jax.device_put(jnp.asarray(xp), NamedSharding(mesh, row_spec(mesh)))


def _pell_powers_local(
    vals, lidx, cbase, span_row, x_local, diag, sub,
    *, halo: int, n_shards: int, s: int, periodic: bool,
    tile: int, k_slots: int, sw: int, n_win: int, n_x: int,
    interpret: bool = False, axes: RowAxes = ROWS,
):
    """One halo exchange + s local PELL recurrence steps -> (n_local, s+1).

    Kernel-seam cast: the kernel runs at the plane dtype (f32); driver
    state dtype is caller-controlled (f64 IRL state), cast at the seam
    only — same contract as the dist-ilv engine and pell_apply."""
    xp = _halo_exchange(x_local, halo, n_shards, periodic, axes)
    m = xp.shape[0]
    g_x = n_x // LANES
    kdt = vals.dtype
    x2 = jnp.pad(xp, (0, n_x - m)).reshape(-1, LANES).astype(kdt)
    vp = jnp.zeros_like(x2)
    centers = []
    n_local = x_local.shape[0]
    for k in range(s):
        coefs = jnp.stack([diag[k], sub[k]]).astype(kdt)
        y2 = _pell_step(
            vals, lidx, cbase, span_row, x2, vp, coefs,
            tile, k_slots, sw, n_win, interpret,
        )
        y2 = jnp.pad(y2, ((0, g_x - y2.shape[0]), (0, 0)))
        centers.append(y2.reshape(-1)[halo : halo + n_local])
        vp, x2 = x2, y2
    return jnp.concatenate(
        [x_local[:, None],
         jnp.stack(centers, axis=1).astype(x_local.dtype)], axis=1
    )


@partial(jax.jit, static_argnames=("s", "mesh"))
def dist_pell_matrix_powers(
    A: DistPell, x: jax.Array, s: int, diag: jax.Array, sub: jax.Array, mesh: Mesh
) -> jax.Array:
    """Distributed matrix powers for general sparsity via the PELL kernel."""

    kw = dict(
        halo=A.halo, n_shards=A.n_shards, s=s, periodic=A.periodic,
        tile=A.tile, k_slots=A.k_slots, sw=A.sw, n_win=A.n_win,
        n_x=A.n_x, interpret=A.interpret, axes=row_axes(mesh),
    )

    def body(v_b, l_b, cb_b, sp_b, x_local, dg, sb):
        return _pell_powers_local(
            v_b[0], l_b[0], cb_b[0], sp_b[0], x_local, dg, sb, **kw
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            row_spec(mesh), row_spec(mesh), row_spec(mesh),
            row_spec(mesh), row_spec(mesh),
            PartitionSpec(), PartitionSpec(),
        ),
        out_specs=row_spec(mesh),
        # Pallas interpret mode does not propagate varying manual axes;
        # the vma check only has to come off for CPU-interpret runs.
        check_vma=not A.interpret,
    )(A.vals, A.lidx, A.cbase, A.span_row, x, diag, sub)
