"""Automatic operator-format routing: scipy/dense input -> the fastest
TPU format this framework has for its sparsity.

The reference's SpMV abstraction takes whatever sparse matrix MATLAB
hands it (SpMV.m:1-9) and the corpus harness feeds it arbitrary
SuiteSparse structure (test_restarted_ca_lanczos_all_matrices.m:6-14).
On TPU the format choice IS the performance story (see ops/spmv.py), so
``make_operator`` is the production entry for "I have a matrix, give me
an operator":

  1. tiny           -> DenseMatrix        (MXU matmul beats any sparse path)
  2. few diagonals  -> IlvDiaMatrix       (interleaved fused s-step kernel,
                                           ~659 Gnnz/s/chip; TPU f32 with a
                                           valid tiling — zero-pad to the
                                           8192-row unit is part of the
                                           route) else DiaMatrix (roll-based
                                           fused kernel, ~470 Gnnz/s/chip)
  3. windowed nnz   -> PellMatrix         (general-sparsity Pallas kernel,
                                           ~8-33 Gnnz/s/chip)
  4. scattered      -> RCM reorder, then re-route the permuted matrix
                       through 2-3 (returns the permutation for vector
                       encode/decode)
  5. everything else-> EllMatrix          (XLA gather; correct but slow)

The returned ``OperatorRoute`` records the decision and carries the
permutation (identity passthrough when none), so eigenvectors map back
with ``route.restore(V)`` regardless of which branch fired.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu.ops.pell import PellMatrix
from ca_lanczos_tpu.ops.spmv import DenseMatrix, DiaMatrix, EllMatrix

# IlvDiaMatrix (ops.pallas_ilv) also routes; kept out of the Union to
# avoid importing the Pallas machinery at module load — Routable is
# duck-typed on matvec/shape/dtype/nnz like ops.spmv.Operator.
Routable = Union[DenseMatrix, DiaMatrix, EllMatrix, PellMatrix]


def dia_from_scipy(
    a,
    max_diags: int = 64,
    waste_cap: float = 8.0,
    dtype=None,
    device: bool = True,
) -> Optional[DiaMatrix]:
    """Build DIA storage from a scipy matrix when it is diagonal-sparse.

    Returns None unless the matrix lives on <= ``max_diags`` distinct
    diagonals AND the dense-plane padding waste ``len(offsets) * n`` stays
    within ``waste_cap`` x nnz (DIA stores every diagonal densely; the
    fused kernel's ~14x throughput edge over PELL makes moderate waste a
    win, but unbounded waste would just stream zeros).  Vectorized
    O(nnz log nnz) — corpus-scale safe, unlike the per-entry loop in
    ``utils.reorder.rcm_reorder``.

    Plane convention (ops/spmv.py DiaMatrix): data[k, i] = A[i, i + off_k].

    device=False keeps the planes as host numpy — for consumers that
    immediately re-partition on the host (the dist route), avoiding a
    device round-trip that is minutes-slow through the axon relay.
    """
    import scipy.sparse as sp

    coo = sp.coo_matrix(a)
    coo.sum_duplicates()
    n = coo.shape[0]
    if coo.shape[0] != coo.shape[1]:
        raise ValueError("square matrices only")
    if np.iscomplexobj(coo.data):
        raise ValueError(
            "real matrices only (astype would silently drop imaginary "
            "parts); complex propagation flows use the split "
            "representation, see ops.csplit / solvers.propagators"
        )
    if dtype is None:
        dtype = np.float64 if coo.data.dtype == np.float64 else np.float32
    if coo.nnz == 0:
        return DiaMatrix(data=jnp.zeros((1, n), dtype), offsets=(0,))
    offs_e = coo.col.astype(np.int64) - coo.row.astype(np.int64)
    offsets = np.unique(offs_e)
    if len(offsets) > max_diags or len(offsets) * n > waste_cap * coo.nnz:
        return None
    data = np.zeros((len(offsets), n), dtype)
    k = np.searchsorted(offsets, offs_e)
    data[k, coo.row] = coo.data.astype(dtype)
    return DiaMatrix(
        data=jnp.asarray(data) if device else data,
        offsets=tuple(int(d) for d in offsets),
    )


@dataclasses.dataclass
class OperatorRoute:
    """Record of a ``make_operator`` decision.

    perm is new_index -> old_index (as in utils.reorder.Reordering);
    None means no reordering was applied and apply/restore are identity.

    n_orig: set when the route zero-padded the operator (the ilv format
    needs n % 8192 == 0) — ``apply`` embeds original-order vectors into
    the padded domain before permuting, ``restore`` truncates back, so
    callers still never see the layout.  perm then has padded length.
    """

    format: str  # "dense" | "dia" | "ilv" | "pell" | "ell"
    perm: Optional[np.ndarray]
    notes: List[str]
    nnz: int
    bandwidth_before: Optional[int] = None
    bandwidth_after: Optional[int] = None
    n_orig: Optional[int] = None

    def apply(self, x) -> np.ndarray:
        """Map original-order vectors/multivectors into operator order."""
        x = np.asarray(x)
        if self.perm is None:
            return x
        if self.n_orig is not None and len(self.perm) > x.shape[0]:
            pad = np.zeros((len(self.perm) - x.shape[0],) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad], axis=0)
        return x[self.perm]

    def restore(self, x) -> np.ndarray:
        """Map operator-order vectors/multivectors back to original order."""
        x = np.asarray(x)
        if self.perm is not None:
            out = np.empty_like(x)
            out[self.perm] = x
            x = out
        if self.n_orig is not None:
            x = x[: self.n_orig]
        return x


def _route_csr(
    csr,
    notes: List[str],
    *,
    max_diags: int,
    dia_waste_cap: float,
    tile: int,
    encoding: str,
    max_windows: int,
    sw: Optional[int],
) -> Tuple[Optional[Routable], str]:
    # DIA planes stay host-side here: the ilv upgrade (and the dist
    # partitioners) repack them on host, and a device round-trip through
    # the axon relay is minutes-slow.  make_operator device-puts the
    # planes of whatever format wins.
    A = dia_from_scipy(csr, max_diags=max_diags, waste_cap=dia_waste_cap,
                       device=False)
    if A is not None:
        return A, "dia"
    try:
        A = PellMatrix.from_scipy(
            csr, tile=tile, encoding=encoding, max_windows=max_windows, sw=sw
        )
        return A, "pell"
    except ValueError as e:  # window overflow
        notes.append(f"pell rejected: {e}")
        return None, ""


def _gershgorin_mid(csr) -> float:
    """Midpoint of the Gershgorin spectrum hull — strictly inside the
    spectrum, so padding rows given this diagonal value can never surface
    among extreme Ritz values (largest OR smallest targeting)."""
    diag = np.asarray(csr.diagonal(), np.float64)
    absrow = np.asarray(np.abs(csr).sum(axis=1)).ravel().astype(np.float64)
    rad = absrow - np.abs(diag)
    return 0.5 * (float((diag - rad).min()) + float((diag + rad).max()))


def _maybe_ilv(A: DiaMatrix, csr, notes: List[str], ilv):
    """Upgrade a host-plane DiaMatrix to the interleaved carrier when the
    TPU fused ILV kernel serves it — the production banded fast path
    (659 vs 470 Gnnz/s for the roll-based fused kernel, BENCHMARKS.md).

    Returns (IlvDiaMatrix, perm_il (n_pad new->old), n_pad) or None.
    ``ilv``: "auto" upgrades float32 planes on a device backend;
    True forces (casting planes to float32 — the kernel's dtype);
    False disables.

    The operator is zero-padded to the kernel's 8192-row tiling unit;
    pad rows get the Gershgorin-midpoint diagonal so their eigenvalues
    sit strictly inside the spectrum hull (a start vector routed through
    ``OperatorRoute.apply`` is zero on the pad rows, which the recurrence
    preserves exactly — the fill only guards flows that inject random
    mass, e.g. breakdown recovery).  Reference seam: SpMV.m:1-9.
    """
    from ca_lanczos_tpu.ops.pallas_ilv import J, WQ, IlvDiaMatrix, pick_tq

    if ilv is False:
        return None
    data = np.asarray(A.data)
    nd, n = data.shape
    w = max((abs(o) for o in A.offsets), default=0)
    if 8 * ((w + J - 1) // J) > WQ:  # production s=8 must fit the q-halo
        if ilv is True:
            raise ValueError(
                f"ilv forced but bandwidth {w} exceeds the s=8 halo bound "
                f"(need 8*ceil(w/{J}) <= {WQ})"
            )
        return None
    if ilv == "auto":
        import jax as _jax

        try:
            if _jax.default_backend() == "cpu":
                return None
        except Exception:  # pragma: no cover
            return None
        if data.dtype != np.float32:
            notes.append("ilv skipped: planes not float32 (force with prefer='ilv')")
            return None
    n_pad = max(2 * 8192, -(-n // 8192) * 8192)
    tq = pick_tq(n_pad, nd)
    if tq == 0:
        return None
    if ilv == "auto" and n_pad > 1.25 * n:
        notes.append(f"ilv skipped: pad waste {n_pad / n:.2f}x > 1.25x")
        return None
    pdata = np.zeros((nd, n_pad), np.float32)
    pdata[:, :n] = data.astype(np.float32)
    if n_pad > n and 0 in A.offsets:
        pdata[A.offsets.index(0), n:] = np.float32(_gershgorin_mid(csr))
    Ail = IlvDiaMatrix.from_dia(
        DiaMatrix(data=pdata, offsets=A.offsets), tq=tq, keep_dia=True
    )
    nq = n_pad // J
    perm_il = np.arange(n_pad).reshape(nq, J).T.reshape(-1)
    notes.append(f"ilv: interleaved carrier, n {n} -> {n_pad}, tq={tq}")
    return Ail, perm_il, n_pad


def negate_operator(A: Routable) -> Routable:
    """-A in the same encoded format (value planes negated in place of
    a re-encode).  Lanczos drivers lock the LARGEST Ritz pairs (power-
    iteration bias, restarted_ca_lanczos.m:183-201); solving -A and
    negating the eigenvalues back targets the smallest end without new
    machinery."""
    from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix as _I
    from ca_lanczos_tpu.ops.pell import PellMatrix as _P

    if isinstance(A, DiaMatrix):
        return DiaMatrix(data=-A.data, offsets=A.offsets)
    if isinstance(A, _I):
        return dataclasses.replace(
            A, dflat=-A.dflat,
            dia_data=None if A.dia_data is None else -A.dia_data,
        )
    if isinstance(A, EllMatrix):
        B: Routable = EllMatrix(vals=-A.vals, cols=A.cols)
    elif isinstance(A, DenseMatrix):
        return DenseMatrix(a=-A.a)
    elif isinstance(A, _P):
        B = dataclasses.replace(A, vals=-A.vals)
    else:
        raise TypeError(f"cannot negate {type(A).__name__}")
    # from_scipy attaches host-side plane copies so dist partitioners
    # never fetch device arrays back through the (minutes-slow) relay;
    # carry them across the negation with the value plane negated.
    hp = getattr(A, "host_planes", None)
    if hp is not None:
        object.__setattr__(B, "host_planes", (-hp[0],) + tuple(hp[1:]))
    return B


def save_operator(path: str, A: Routable, route: Optional[OperatorRoute] = None) -> None:
    """Serialize an encoded operator (+ its route) to one ``.npz`` file.

    Production encode-once/solve-many: the PELL encoder is host numpy at
    ~8 s per 295k-row window and DIA/ELL conversion is O(nnz) — at
    corpus scale the encodings dominate startup, so deployments encode
    on a CPU host once and ship the planes.  Round-trips DiaMatrix /
    EllMatrix / DenseMatrix / PellMatrix bit-exactly.
    """
    from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix as _I
    from ca_lanczos_tpu.ops.pell import PellMatrix as _P

    arrs = {}
    if isinstance(A, DiaMatrix):
        arrs = dict(kind="dia", data=np.asarray(A.data),
                    offsets=np.asarray(A.offsets, np.int64))
    elif isinstance(A, _I):
        if A.dia_data is None:
            raise ValueError(
                "IlvDiaMatrix without dia_data cannot be serialized "
                "(construct with keep_dia=True)"
            )
        arrs = dict(kind="ilv", data=np.asarray(A.dia_data),
                    offsets=np.asarray(A.offsets, np.int64),
                    tq=np.asarray(A.tq, np.int64))
    elif isinstance(A, EllMatrix):
        arrs = dict(kind="ell", vals=np.asarray(A.vals),
                    cols=np.asarray(A.cols))
    elif isinstance(A, DenseMatrix):
        arrs = dict(kind="dense", a=np.asarray(A.a))
    elif isinstance(A, _P):
        arrs = dict(
            kind="pell", vals=np.asarray(A.vals), lidx=np.asarray(A.lidx),
            cbase=np.asarray(A.cbase), span_row=np.asarray(A.span_row),
            statics=np.asarray(
                [A.n, A.tile, A.k_slots, A.sw, A.nnz_count, A.n_win], np.int64
            ),
            enc=np.asarray(A.enc),
        )
    else:
        raise TypeError(f"cannot serialize {type(A).__name__}")
    if route is not None:
        arrs["route_format"] = np.asarray(route.format)
        arrs["route_nnz"] = np.asarray(route.nnz, np.int64)
        arrs["route_notes"] = np.asarray("\n".join(route.notes))
        if route.perm is not None:
            arrs["route_perm"] = np.asarray(route.perm, np.int64)
        if route.n_orig is not None:
            arrs["route_n_orig"] = np.asarray(route.n_orig, np.int64)
    np.savez_compressed(path, **arrs)


def load_operator_npz(
    path: str,
) -> Tuple[Routable, Optional[OperatorRoute]]:
    """Inverse of :func:`save_operator`."""
    from ca_lanczos_tpu.ops.pell import PellMatrix as _P

    z = np.load(path, allow_pickle=False)
    kind = str(z["kind"])
    if kind == "dia":
        A: Routable = DiaMatrix(
            data=jnp.asarray(z["data"]),
            offsets=tuple(int(o) for o in z["offsets"]),
        )
    elif kind == "ilv":
        from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix as _I

        A = _I.from_dia(
            DiaMatrix(data=z["data"], offsets=tuple(int(o) for o in z["offsets"])),
            tq=int(z["tq"]),
        )
    elif kind == "ell":
        A = EllMatrix(vals=jnp.asarray(z["vals"]), cols=jnp.asarray(z["cols"]))
    elif kind == "dense":
        A = DenseMatrix(a=jnp.asarray(z["a"]))
    elif kind == "pell":
        n, tile, k_slots, sw, nnz_count, n_win = (int(v) for v in z["statics"])
        A = _P(
            vals=jnp.asarray(z["vals"]), lidx=jnp.asarray(z["lidx"]),
            cbase=jnp.asarray(z["cbase"]), span_row=jnp.asarray(z["span_row"]),
            n=n, tile=tile, k_slots=k_slots, sw=sw, nnz_count=nnz_count,
            n_win=n_win, enc=str(z["enc"]),
        )
    else:
        raise ValueError(f"unknown operator kind {kind!r} in {path}")
    route = None
    if "route_format" in z:
        notes = str(z["route_notes"])
        route = OperatorRoute(
            format=str(z["route_format"]),
            perm=np.asarray(z["route_perm"]) if "route_perm" in z else None,
            notes=notes.split("\n") if notes else [],
            nnz=int(z["route_nnz"]),
            n_orig=int(z["route_n_orig"]) if "route_n_orig" in z else None,
        )
    return A, route


def make_operator(
    a,
    *,
    prefer: str = "auto",
    dense_cutoff: int = 2048,
    max_diags: int = 64,
    dia_waste_cap: float = 8.0,
    tile: int = 1024,
    encoding: str = "auto",
    max_windows: int = 16,
    sw: Optional[int] = None,
    allow_reorder: bool = True,
    allow_ell_fallback: bool = True,
    ilv="auto",
) -> Tuple[Routable, OperatorRoute]:
    """Route any square scipy.sparse / dense matrix to a TPU operator.

    prefer: "auto" routes per the module docstring; "dense" / "dia" /
    "ilv" / "pell" / "ell" force that format (dia/ilv raise if the
    matrix does not qualify under ``max_diags`` / ``dia_waste_cap`` /
    the interleave tiling).

    ilv: "auto" (default) upgrades TPU-eligible float32 DIA routes to the
    interleaved carrier (IlvDiaMatrix — the fastest banded kernel, with
    the interleave permutation and any pad captured in the route); False
    keeps plain DiaMatrix; True forces the upgrade (casting to float32).

    Returns (operator, route).  When routing reordered the matrix
    (route.perm is not None) the caller must run the solver on
    ``route.apply(r0)`` and map Ritz vectors back with
    ``route.restore(V)``; eigenVALUES are permutation-invariant.
    """
    import scipy.sparse as sp

    if sp.issparse(a):
        csr = sp.csr_matrix(a)
    else:
        csr = sp.csr_matrix(np.asarray(a))
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("square matrices only")
    if np.iscomplexobj(csr.data):
        raise ValueError(
            "real matrices only (astype would silently drop imaginary "
            "parts); complex propagation flows use the split "
            "representation, see ops.csplit / solvers.propagators"
        )
    csr.sum_duplicates()
    csr.sort_indices()
    n = csr.shape[0]
    nnz = int(csr.nnz)
    notes: List[str] = []

    if prefer == "dense" or (prefer == "auto" and n <= dense_cutoff):
        dtype = np.float64 if csr.dtype == np.float64 else np.float32
        A = DenseMatrix(a=jnp.asarray(csr.toarray().astype(dtype)))
        notes.append(f"n={n} <= dense_cutoff={dense_cutoff}"
                     if prefer == "auto" else "forced dense")
        return A, OperatorRoute("dense", None, notes, nnz)
    if prefer == "dia":
        A = dia_from_scipy(csr, max_diags=max_diags, waste_cap=dia_waste_cap)
        if A is None:
            raise ValueError(
                f"matrix does not qualify for DIA (max_diags={max_diags},"
                f" waste_cap={dia_waste_cap})"
            )
        return A, OperatorRoute("dia", None, ["forced dia"], nnz)
    if prefer == "ilv":
        Ah = dia_from_scipy(
            csr, max_diags=max_diags, waste_cap=dia_waste_cap, device=False
        )
        if Ah is None:
            raise ValueError(
                f"matrix does not qualify for DIA/ilv (max_diags={max_diags},"
                f" waste_cap={dia_waste_cap})"
            )
        up = _maybe_ilv(Ah, csr, notes, True)
        if up is None:
            raise ValueError(
                f"n={n} does not admit the interleaved tiling (no valid tile)"
            )
        Ail, perm_il, _ = up
        return Ail, OperatorRoute(
            "ilv", perm_il, ["forced ilv"] + notes, nnz, n_orig=n
        )
    if prefer == "pell":
        A = PellMatrix.from_scipy(
            csr, tile=tile, encoding=encoding, max_windows=max_windows, sw=sw
        )
        return A, OperatorRoute("pell", None, ["forced pell"], nnz)
    if prefer == "ell":
        return (
            EllMatrix.from_scipy(csr),
            OperatorRoute("ell", None, ["forced ell"], nnz),
        )
    if prefer != "auto":
        raise ValueError(f"unknown prefer={prefer!r}")

    kw = dict(
        max_diags=max_diags,
        dia_waste_cap=dia_waste_cap,
        tile=tile,
        encoding=encoding,
        max_windows=max_windows,
        sw=sw,
    )

    def _finish(A, fmt, perm, csr_used, bw_b=None, bw_a=None):
        """Upgrade a host-plane DIA win to the ilv carrier (composing the
        interleave permutation with any RCM perm); device-put otherwise."""
        if fmt == "dia":
            up = _maybe_ilv(A, csr_used, notes, ilv)
            if up is not None:
                Ail, perm_il, n_pad = up
                if perm is None:
                    total = perm_il
                else:
                    ext = np.concatenate(
                        [np.asarray(perm), np.arange(n, n_pad)]
                    )
                    total = ext[perm_il]
                return Ail, OperatorRoute(
                    "ilv", total, notes, nnz, bw_b, bw_a, n_orig=n
                )
            A = DiaMatrix(data=jnp.asarray(A.data), offsets=A.offsets)
        return A, OperatorRoute(fmt, perm, notes, nnz, bw_b, bw_a)

    A, fmt = _route_csr(csr, notes, **kw)
    if A is not None:
        return _finish(A, fmt, None, csr)

    bw_before = bw_after = None
    if allow_reorder and nnz:
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        perm = np.asarray(reverse_cuthill_mckee(csr, symmetric_mode=True))
        csr_p = csr[perm][:, perm].tocsr()
        csr_p.sort_indices()
        coo0, coo1 = csr.tocoo(), csr_p.tocoo()
        bw_before = int(np.max(np.abs(coo0.row - coo0.col)))
        bw_after = int(np.max(np.abs(coo1.row - coo1.col)))
        notes.append(f"rcm: bandwidth {bw_before} -> {bw_after}")
        A, fmt = _route_csr(csr_p, notes, **kw)
        if A is not None:
            return _finish(A, fmt, perm, csr_p, bw_before, bw_after)
        if allow_ell_fallback:
            notes.append("ell fallback (XLA gather path — slow on TPU)")
            return (
                EllMatrix.from_scipy(csr_p),
                OperatorRoute("ell", perm, notes, nnz, bw_before, bw_after),
            )
    if allow_ell_fallback:
        notes.append("ell fallback (XLA gather path — slow on TPU)")
        return (
            EllMatrix.from_scipy(csr),
            OperatorRoute("ell", None, notes, nnz, bw_before, bw_after),
        )
    raise ValueError(
        "no TPU-fast format fits this sparsity and fallbacks are disabled: "
        + "; ".join(notes)
    )
