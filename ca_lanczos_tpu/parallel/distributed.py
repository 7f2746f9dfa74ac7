"""Row-sharded distributed operator and the halo-exchange matrix-powers kernel.

This is the communication-avoiding core the MATLAB reference only simulates
sequentially (SpMV.m:6-8, matrix_powers_monomial.m:6-12): the matrix is
partitioned in contiguous row blocks over a 1-D ``('rows',)`` mesh and the
s-step Krylov block ``[x, Ax, ..., A^s x]`` is computed with exactly ONE
boundary exchange per s SpMVs:

* each device holds its own matrix rows PLUS the rows of the s-deep ghost
  region (precomputed at partition time — the "matrix halo");
* one ``ppermute`` pair per block pulls the s*w-deep vector halo from the
  ring neighbors (w = operator bandwidth), riding ICI;
* s local banded SpMVs then run entirely on-chip: step k pollutes only the
  outermost k*w entries of the padded vector, so the owned center rows
  remain exact for all s steps.

Communication volume per block: 2*s*w elements/device, independent of s in
*rounds* (1 round instead of the s rounds a naive distributed Lanczos pays).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec
from jax.tree_util import register_dataclass

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.parallel.mesh import ROWS


@register_dataclass
@dataclasses.dataclass(frozen=True)
class DistDia:
    """Row-sharded DIA operator with an s-deep matrix halo.

    data: (P, ndiags, n_local + 2*halo) — shard p holds the DIA data of
        global rows [p*n_local - halo, (p+1)*n_local + halo), zero-padded
        outside [0, n).  Sharded over the leading mesh axis.
    offsets: static diagonal offsets (see ops.spmv.DiaMatrix).
    halo: ghost depth in rows; must be >= s_max * max|offset|.

    When the shard shape admits the fused Pallas s-step kernel
    (ops.pallas_spmv._dia_powers_fused), ``dflat`` holds the per-shard
    flat-padded matrix layout (P, ndiags*(m_pad + 2*fused_w)) built once
    at partition time, so the distributed matrix powers run at the fused
    kernel's HBM rate instead of the XLA shifted-slice rate
    (reference hot loop: matrix_powers_monomial.m:6-12).
    """

    data: jax.Array
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    dflat: Optional[jax.Array] = None
    fused_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    m_pad: int = dataclasses.field(default=0, metadata=dict(static=True))
    fused_tile: int = dataclasses.field(default=0, metadata=dict(static=True))
    fused_interpret: bool = dataclasses.field(default=False, metadata=dict(static=True))
    periodic: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Interleaved-layout local step (ops.pallas_ilv): per-shard tile-major
    # planes over the shard's padded local domain.  The shard body encodes
    # the exchanged vector once per block (one transpose), runs the ilv
    # kernel, and the decode fuses into the center-slice output copy.
    ilv_dflat: Optional[jax.Array] = None
    ilv_tq: int = dataclasses.field(default=0, metadata=dict(static=True))
    ilv_m_pad: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.data.shape[0]

    @property
    def n_local(self) -> int:
        return self.data.shape[2] - 2 * self.halo

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    @property
    def bandwidth(self) -> int:
        return max(abs(k) for k in self.offsets) if self.offsets else 0

    @property
    def s_max(self) -> int:
        """Largest s the stored halo supports."""
        w = self.bandwidth
        return self.halo // w if w else 10**9

    @staticmethod
    def from_dia(
        A: DiaMatrix,
        mesh: Mesh,
        s_max: int,
        fused: Optional[bool] = None,
        interpret: bool = False,
        periodic: bool = False,
        ilv: bool = False,
    ) -> "DistDia":
        """Partition a DIA operator over ``mesh`` with an s_max-deep halo.

        Rows are padded to a multiple of the shard count; padding rows are
        zero (harmless: they contribute nothing and their Krylov entries
        stay zero when the start vector is zero-padded likewise).

        ``fused`` selects the fused Pallas kernel for the local s-step
        computation (None = auto: on when every mesh device is a TPU and
        the shard shape admits an aligned tile).  ``interpret`` runs the
        kernel in Pallas interpret mode (CPU testing).

        ``periodic=True`` interprets the DIA data as circulant-banded
        (``A[i, (i + off) mod n] = data[d, i]``, the runLanczos wrap) and
        fills the matrix ghost rows from the wrapped end; requires n to
        divide evenly over the shards so the ring stays aligned.

        ``ilv=True`` additionally precomputes the per-shard interleaved
        tile-major layout (ops.pallas_ilv) so the shard-local s-step
        computation rides the fastest banded kernel (659 vs 470 Gnnz/s
        single-chip); silently skipped when the shard's padded domain
        admits no interleave tiling or the s_max halo bound fails.
        """
        from ca_lanczos_tpu.ops.pallas_spmv import fused_tile

        P_ = mesh.devices.size
        data = np.asarray(A.data)
        ndiags, n = data.shape
        w = max(abs(k) for k in A.offsets) if A.offsets else 0
        n_local = -(-n // P_)
        n_pad = n_local * P_
        halo = max(1, s_max * w)
        if halo >= n_local:
            raise ValueError(
                f"halo {halo} >= shard size {n_local}: increase rows/device or lower s"
            )
        # Global data padded to n_pad rows, then per-shard slices with halo
        # overlap (the matrix ghost rows).
        if periodic and n_pad != n:
            raise ValueError(
                f"periodic operator: n={n} must divide evenly over {P_} shards"
            )
        gdata = np.zeros((ndiags, n_pad + 2 * halo), data.dtype)
        gdata[:, halo : halo + n] = data
        if periodic:
            gdata[:, :halo] = data[:, n - halo :]
            gdata[:, halo + n :] = data[:, :halo]
        shards = np.stack(
            [gdata[:, p * n_local : p * n_local + n_local + 2 * halo] for p in range(P_)]
        )
        sharded = jax.device_put(
            jnp.asarray(shards), NamedSharding(mesh, PartitionSpec(ROWS))
        )
        if fused is None:
            # x64 processes are fine: the kernels trace under
            # ops._mosaic.x64_trace_off, which keeps every literal i32.
            fused = not interpret and all(
                d.platform == "tpu" for d in mesh.devices.flat
            )
        dflat = None
        W = m_pad = ftile = 0
        if fused:
            m = n_local + 2 * halo
            # Pad to the kernel's sweet-spot tile (65536) when the shard is
            # big enough so pick_tile lands on it; 1024-unit otherwise.
            unit = 65536 if m >= 65536 else 1024
            m_pad = ((m + unit - 1) // unit) * unit
            W = max(1024, ((s_max * w + 1023) // 1024) * 1024)
            ftile = fused_tile(m_pad, ndiags, W, s_max, data.dtype)
            if ftile == 0:
                fused = False
                W = m_pad = 0
            else:
                # Per-shard flat layout: each diagonal row padded to m_pad
                # then W on both sides, concatenated (see dia_flat_padded).
                fshards = np.zeros((P_, ndiags * (m_pad + 2 * W)), data.dtype)
                for p in range(P_):
                    padded = np.zeros((ndiags, m_pad + 2 * W), data.dtype)
                    padded[:, W : W + m] = shards[p]
                    fshards[p] = padded.reshape(-1)
                dflat = jax.device_put(
                    jnp.asarray(fshards), NamedSharding(mesh, PartitionSpec(ROWS))
                )
        ilv_dflat = None
        ilv_tq = ilv_m_pad = 0
        if ilv:
            from ca_lanczos_tpu.ops.pallas_ilv import (
                J as _J, WQ as _WQ, ilv_data_tiled, pick_tq,
            )

            m = n_local + 2 * halo
            # Pad so the LARGEST tile divides: with the minimal 8192
            # alignment a halo-padded shard typically leaves
            # nq % 16384 != 0, pick_tq degrades to tq=1024, and the
            # fixed 2*WQ=2048 halo re-fetch per tile triples the data
            # traffic (measured 16 vs 313 Gnnz/s at P=1).  Up to
            # J*16384-1 pad rows (3% at a 4M shard) buys the 16384
            # sweet spot; prefer whichever alignment yields the larger
            # tile (small shards may only validate under the 8192 one).
            imp = tq = 0
            for align in (_J * 16384, 8192):
                cand = max(2 * align, -(-m // align) * align)
                t = pick_tq(cand, ndiags)
                if t > tq or (t == tq and cand < imp):
                    imp, tq = cand, t
            carry = max(((abs(o) + _J - 1) // _J for o in A.offsets), default=0)
            if tq and s_max * carry <= _WQ and data.dtype == np.float32:
                ishards = np.zeros(
                    (P_, (imp // (_J * tq)) * ndiags * _J * (tq + 2 * _WQ)),
                    data.dtype,
                )
                for p in range(P_):
                    padded = np.zeros((ndiags, imp), data.dtype)
                    padded[:, :m] = shards[p]
                    ishards[p] = ilv_data_tiled(
                        DiaMatrix(data=padded, offsets=A.offsets), tq
                    )
                ilv_dflat = jax.device_put(
                    jnp.asarray(ishards), NamedSharding(mesh, PartitionSpec(ROWS))
                )
                ilv_tq, ilv_m_pad = tq, imp
        return DistDia(
            data=sharded,
            offsets=A.offsets,
            halo=halo,
            n=n,
            dflat=dflat,
            fused_w=W,
            m_pad=m_pad,
            fused_tile=ftile,
            fused_interpret=interpret,
            periodic=periodic,
            ilv_dflat=ilv_dflat,
            ilv_tq=ilv_tq,
            ilv_m_pad=ilv_m_pad,
        )

    def shard_vector(self, x, mesh: Mesh) -> jax.Array:
        """Zero-pad a global (n,) vector to (P*n_local,) and row-shard it."""
        x = np.asarray(x)
        n_pad = self.n_shards * self.n_local
        xp = np.zeros((n_pad,) + x.shape[1:], x.dtype)
        xp[: self.n] = x
        return jax.device_put(jnp.asarray(xp), NamedSharding(mesh, PartitionSpec(ROWS)))


def _dia_matvec_local(offsets: Tuple[int, ...], data: jax.Array, x: jax.Array) -> jax.Array:
    """Banded matvec on an already-padded local vector; rows line up with
    ``data`` columns.  Same structure as ops.spmv._dia_matvec."""
    m = data.shape[1]
    wl = max(0, -min(offsets)) if offsets else 0
    wr = max(0, max(offsets)) if offsets else 0
    xp = jnp.pad(x, (wl, wr))
    y = jnp.zeros_like(x)
    for d, k in enumerate(offsets):
        y = y + data[d] * lax.slice_in_dim(xp, wl + k, wl + k + m, axis=0)
    return y


def _halo_exchange(
    x_local: jax.Array, halo: int, n_shards: int, periodic: bool = False
) -> jax.Array:
    """Pull ``halo`` rows from each ring neighbor; edge shards get zeros
    (ppermute semantics — correct for non-periodic operators whose halo
    rows beyond the boundary are zero).  With ``periodic=True`` the ring
    closes: edge shards pull the wrapped rows from the opposite end, so
    circulant-banded operators (the reference's periodic FD Hamiltonian,
    runLanczos.m:15-18) distribute like any banded operator."""
    if periodic:
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [((i + 1) % n_shards, i) for i in range(n_shards)]
    else:
        fwd = [(i, i + 1) for i in range(n_shards - 1)]
        bwd = [(i + 1, i) for i in range(n_shards - 1)]
    with jax.named_scope("halo_exchange"):
        left = lax.ppermute(x_local[-halo:], ROWS, perm=fwd)
        right = lax.ppermute(x_local[:halo], ROWS, perm=bwd)
        return jnp.concatenate([left, x_local, right])


def _powers_local(
    data_local: jax.Array,
    x_local: jax.Array,
    diag: jax.Array,
    sub: jax.Array,
    offsets: Tuple[int, ...],
    halo: int,
    n_shards: int,
    s: int,
    dflat_local: Optional[jax.Array] = None,
    fused_w: int = 0,
    m_pad: int = 0,
    fused_tile: int = 0,
    fused_interpret: bool = False,
    transposed: bool = False,
    include_q: bool = True,
    periodic: bool = False,
    ilv_dflat_local: Optional[jax.Array] = None,
    ilv_tq: int = 0,
    ilv_m_pad: int = 0,
) -> jax.Array:
    """One halo exchange + s local three-term-recurrence SpMVs.

    Implements V[:,k+1] = A V[:,k] - diag[k] V[:,k] - sub[k] V[:,k-1] on
    the padded vector; returns the owned center (n_local, s+1), or
    (s+1, n_local) with ``transposed=True`` — the kernel's natural
    layout, which avoids materializing a transpose at a shard_map
    boundary (callers transpose lazily outside).

    With ``dflat_local`` (the shard's flat-padded layout from
    DistDia.from_dia) the s local steps run through the fused Pallas
    kernel — one matrix HBM read per s steps — instead of the XLA
    shifted-slice scan.  Tile halos pollute inward by bandwidth per step,
    but fused_w >= s*w keeps the owned center exact, identical to the
    single-chip kernel's guarantee.
    """
    xp = _halo_exchange(x_local, halo, n_shards, periodic)
    n_local = x_local.shape[0]

    wmax = max((abs(o) for o in offsets), default=0)
    if (
        ilv_dflat_local is not None
        and s * (-(-wmax // 8)) <= 1024  # ilv WQ q-halo bound
    ):
        from ca_lanczos_tpu.ops.pallas_ilv import (
            J as _J, dia_powers_ilv, ilv_encode_jax,
        )

        m = xp.shape[0]
        x_il = ilv_encode_jax(jnp.pad(xp, (0, ilv_m_pad - m)))
        coefs = jnp.stack([diag[:s], sub[:s]], axis=1).astype(xp.dtype)
        V2, _ = dia_powers_ilv(
            ilv_dflat_local, x_il, coefs, offsets, s, ilv_tq, ilv_m_pad,
            interpret=fused_interpret, with_coefs=True,
        )  # (s, ilv_m_pad) interleaved rows
        # KNOWN SLOW (BENCHMARKS.md layout-cliff note): the per-block
        # encode + per-row interleave decode below are XLA 8-way
        # interleave transposes (~24 Gnnz/s-equivalent at 4.2M) — the
        # dist ILV leg is opt-in (DistDia.from_dia(ilv=True)) and NOT
        # production-routed until the interleaved-center redesign keeps
        # shard state interleaved across blocks.
        Wd = (
            V2.reshape(s, _J, ilv_m_pad // _J)
            .transpose(0, 2, 1)
            .reshape(s, ilv_m_pad)
        )
        center = Wd[:, halo : halo + n_local]
        if not include_q:
            return center if transposed else center.T
        Vq = jnp.concatenate([x_local[None, :], center], axis=0)
        return Vq if transposed else Vq.T

    if dflat_local is not None and s * max(
        (abs(o) for o in offsets), default=0
    ) <= fused_w:
        from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused

        m = xp.shape[0]
        xpp = jnp.pad(xp, (0, m_pad - m))
        coefs = jnp.stack([diag[:s], sub[:s]], axis=1).astype(xp.dtype)
        ws, _ = _dia_powers_fused(
            dflat_local,
            xpp,
            coefs,
            offsets,
            s,
            tile=fused_tile,
            interpret=fused_interpret,
            W=fused_w,
        )  # (s, m_pad)
        center = ws[:, halo : halo + n_local]
        if not include_q:  # caller re-attaches q outside the shard_map
            return center if transposed else center.T
        V = jnp.concatenate([x_local[None, :], center], axis=0)
        return V if transposed else V.T

    def step(carry, coeffs):
        v_km1, v_k = carry
        d, sb = coeffs
        w = _dia_matvec_local(offsets, data_local, v_k) - d * v_k - sb * v_km1
        return (v_k, w), w

    zero = jnp.zeros_like(xp)
    _, ws = lax.scan(step, (zero, xp), (diag[:s], sub[:s]))
    center = ws[:, halo : halo + n_local]  # (s, n_local)
    if not include_q:
        return center if transposed else center.T
    V = jnp.concatenate([x_local[None, :], center], axis=0)
    return V if transposed else V.T  # (n_local, s+1) by default


def dia_powers_operands(A: DistDia):
    """Shard_map operand arrays + the _powers_local kwargs the extra
    blocks bind to (shared by the dist wrappers here and parallel.step)."""
    ops_, names = [A.data], []
    if A.dflat is not None:
        ops_.append(A.dflat)
        names.append("dflat_local")
    if A.ilv_dflat is not None:
        ops_.append(A.ilv_dflat)
        names.append("ilv_dflat_local")
    return tuple(ops_), tuple(names)


def dia_powers_statics(A: DistDia, s: int) -> dict:
    """Static _powers_local kwargs for an operator (shared threading)."""
    return dict(
        offsets=A.offsets, halo=A.halo, n_shards=A.n_shards, s=s,
        fused_w=A.fused_w, m_pad=A.m_pad, fused_tile=A.fused_tile,
        fused_interpret=A.fused_interpret, periodic=A.periodic,
        ilv_tq=A.ilv_tq, ilv_m_pad=A.ilv_m_pad,
    )


@partial(jax.jit, static_argnames=("s", "mesh"))
def dist_matrix_powers(
    A: DistDia,
    x: jax.Array,
    s: int,
    diag: jax.Array,
    sub: jax.Array,
    mesh: Mesh,
) -> jax.Array:
    """Distributed matrix-powers kernel: x (n_pad,) row-sharded ->
    V (n_pad, s+1) row-sharded.  ``diag``/``sub`` are the Newton recurrence
    coefficients ((0, 0) vectors give the monomial basis).

    PERFORMANCE: this convenience layout (leading q column + (n, s+1)
    transpose) costs ~2x at the shard_map boundary when the consumer
    only chains powers.  Chained/kernel-speed callers should use
    ``dist_matrix_powers_rows`` (the layout the drivers use internally);
    this wrapper is the reference-shaped API (matrix_powers.m:1-13)."""
    operands, names = dia_powers_operands(A)
    inner = partial(_powers_local, **dia_powers_statics(A, s))

    def body(*args):
        *blocks, x_local, dg, sb = args
        extra = {nm: blk[0] for nm, blk in zip(names, blocks[1:])}
        return inner(
            blocks[0][0], x_local, dg, sb,
            transposed=True, include_q=False, **extra,
        )

    # The body emits the bare (s, n_local) recurrence block — the kernel's
    # natural layout; prepending q and transposing happen OUTSIDE the
    # shard_map boundary where XLA fuses them into consumers instead of
    # materializing extra (n, s+1) copies.
    W = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple([PartitionSpec(ROWS)] * (len(operands) + 1))
        + (PartitionSpec(), PartitionSpec()),
        out_specs=PartitionSpec(None, ROWS),
    )(*operands, x, diag, sub)
    return jnp.concatenate([x[None, :], W], axis=0).T


@partial(jax.jit, static_argnames=("s", "mesh"))
def dist_matrix_powers_rows(
    A: DistDia,
    x: jax.Array,
    s: int,
    diag: jax.Array,
    sub: jax.Array,
    mesh: Mesh,
) -> jax.Array:
    """Rows-native distributed matrix powers: returns W (s, n_pad) — the
    s recurrence vectors WITHOUT the leading q row or any transpose.

    This is the performance-path variant of ``dist_matrix_powers``: the
    shard_map boundary materializes only the kernel's natural (s, n)
    layout, so a chained consumer (power iteration, bench, scaling sweep)
    reads W[s-1] as a cheap row slice instead of paying the q-concat +
    transpose copies the (n, s+1) API forces (~2x at P=1 on hardware).
    """
    operands, names = dia_powers_operands(A)
    inner = partial(
        _powers_local, transposed=True, include_q=False,
        **dia_powers_statics(A, s),
    )

    def body(*args):
        *blocks, x_local, dg, sb = args
        extra = {nm: blk[0] for nm, blk in zip(names, blocks[1:])}
        return inner(blocks[0][0], x_local, dg, sb, **extra)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple([PartitionSpec(ROWS)] * (len(operands) + 1))
        + (PartitionSpec(), PartitionSpec()),
        out_specs=PartitionSpec(None, ROWS),
    )(*operands, x, diag, sub)


@partial(jax.jit, static_argnames=("mesh",))
def dist_spmv(A: DistDia, x: jax.Array, mesh: Mesh) -> jax.Array:
    """Single distributed SpMV (1-deep use of the stored halo)."""
    def body(data_block, x_local):
        data = data_block[0]
        xp = _halo_exchange(x_local, A.halo, A.n_shards, A.periodic)
        y = _dia_matvec_local(A.offsets, data, xp)
        return y[A.halo : A.halo + x_local.shape[0]]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(PartitionSpec(ROWS), PartitionSpec(ROWS)),
        out_specs=PartitionSpec(ROWS),
    )(A.data, x)
