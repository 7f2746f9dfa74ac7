"""Kernel profiling and roofline audit.

The reference only collects wall-clock (cputime / tic-toc,
test_ca_lanczos.m:26-42, runLanczos.m:66-131).  The north star requires a
per-kernel roofline audit (nnz/s, bytes/flop) — this module provides:

* ``roofline_audit`` — analytic traffic/flop model for the matrix-powers
  step on a DIA operator + a measured throughput -> fraction-of-peak.
* ``measure_powers_throughput`` — honest device timing of the s-step
  kernel: chained work inside one jit (lax.fori_loop), scalar readback to
  defeat async dispatch, two-point latency cancellation (the axon relay
  carries ~30 ms per call and block_until_ready does not fence there).
* ``trace`` — context manager around jax.profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ca_lanczos_tpu.ops.spmv import DiaMatrix

# HBM bandwidth per chip, bytes/s (TPU v5e ~819 GB/s; override per target).
DEFAULT_HBM_BW = 819e9


@dataclasses.dataclass
class RooflineReport:
    nnz: int
    bytes_per_step: int
    flops_per_step: int
    arithmetic_intensity: float  # flop / byte
    sol_nnz_per_s: float  # HBM speed-of-light
    measured_nnz_per_s: Optional[float] = None
    fraction_of_peak: Optional[float] = None

    def __str__(self) -> str:
        lines = [
            f"nnz/step            : {self.nnz:,}",
            f"bytes/step          : {self.bytes_per_step:,}",
            f"flops/step          : {self.flops_per_step:,}",
            f"arith intensity     : {self.arithmetic_intensity:.3f} flop/B (HBM-bound)",
            f"speed of light      : {self.sol_nnz_per_s / 1e9:.1f} Gnnz/s",
        ]
        if self.measured_nnz_per_s is not None:
            lines.append(f"measured            : {self.measured_nnz_per_s / 1e9:.1f} Gnnz/s")
            lines.append(f"fraction of peak    : {100 * self.fraction_of_peak:.1f}%")
        return "\n".join(lines)


def roofline_audit(
    A: DiaMatrix,
    measured_nnz_per_s: Optional[float] = None,
    hbm_bw: float = DEFAULT_HBM_BW,
) -> RooflineReport:
    """Traffic model of one DIA matrix-powers step: read all diagonals +
    the vector, write the result; 2 flops per stored element."""
    itemsize = jnp.dtype(A.dtype).itemsize
    n = A.n
    ndiags = A.data.shape[0]
    nnz = n * ndiags  # stored elements (incl. structural zeros at edges)
    bytes_per_step = (ndiags * n + 2 * n) * itemsize  # data + x + y
    flops = 2 * nnz + 4 * n  # fma per element + shift/correction terms
    sol = hbm_bw / bytes_per_step * nnz
    rep = RooflineReport(
        nnz=nnz,
        bytes_per_step=bytes_per_step,
        flops_per_step=flops,
        arithmetic_intensity=flops / bytes_per_step,
        sol_nnz_per_s=sol,
    )
    if measured_nnz_per_s is not None:
        rep.measured_nnz_per_s = measured_nnz_per_s
        rep.fraction_of_peak = measured_nnz_per_s / sol
    return rep


@partial(jax.jit, static_argnames=("s", "reps", "use_pallas"))
def _chain(A: DiaMatrix, q: jax.Array, s: int, reps: int, use_pallas: bool):
    if use_pallas:
        from ca_lanczos_tpu.ops.pallas_spmv import _dia_power_step

        coefs = jnp.zeros(2, q.dtype)

        def body(i, carry):
            vp, v = carry
            return (v, _dia_power_step(A.data, v, vp, coefs, A.offsets))

        _, v = lax.fori_loop(0, reps * s, body, (jnp.zeros_like(q), q))
        return jnp.sum(v)

    from ca_lanczos_tpu.ops.matrix_powers import matrix_powers_monomial

    def body(i, v):
        return matrix_powers_monomial(A, v, s)[:, s]

    return jnp.sum(lax.fori_loop(0, reps, body, q))


def measure_powers_throughput(
    A: DiaMatrix,
    s: int = 8,
    reps_lo: int = 2,
    reps_hi: int = 12,
    trials: int = 3,
    use_pallas: bool = True,
) -> float:
    """Device-true nnz/s of the matrix-powers chain (see module doc)."""
    n = A.n
    q = jnp.asarray(np.random.default_rng(0).standard_normal(n), A.dtype)
    try:
        float(_chain(A, q, s, reps_lo, use_pallas))
    except Exception:
        use_pallas = False
    float(_chain(A, q, s, reps_lo, use_pallas))
    float(_chain(A, q, s, reps_hi, use_pallas))

    def timed(reps):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(_chain(A, q, s, reps, use_pallas))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_hi, t_lo = timed(reps_hi), timed(reps_lo)
    dt = t_hi - t_lo
    if dt <= 0:  # timing noise beat the latency-cancellation margin
        return A.n * A.data.shape[0] * s * reps_hi / t_hi
    return A.n * A.data.shape[0] * s * (reps_hi - reps_lo) / dt


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace for TensorBoard; wrap the region of interest."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@partial(jax.jit, static_argnames=("s", "blocks", "use_pallas"))
def _ca_chain(A: DiaMatrix, Q0: jax.Array, s: int, blocks: int, use_pallas: bool):
    """``blocks`` fully-fused CA iterations: matrix powers from the carry
    block's last column, two-pass CGS against the carry, CholQR2 — the
    production serving step (all on device, no host syncs)."""
    from ca_lanczos_tpu.ops.qr import cholqr2

    if use_pallas:
        from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused, dia_flat_padded

        wmax = max(abs(o) for o in A.offsets)
        W = ((s * wmax + 1023) // 1024) * 1024
        dflat = dia_flat_padded(A, W)  # loop-invariant, hoisted by XLA
        coefs = jnp.zeros((s, 2), Q0.dtype)

        def powers(q):
            V, _ = _dia_powers_fused(dflat, q, coefs, A.offsets, s)
            return jnp.concatenate([q[:, None], V.T], axis=1)
    else:
        from ca_lanczos_tpu.ops.matrix_powers import matrix_powers_monomial

        def powers(q):
            return matrix_powers_monomial(A, q, s)

    def body(i, Qp):
        V = powers(Qp[:, -1])
        X = V[:, 1:]
        for _ in range(2):
            X = X - Qp @ (Qp.T @ X)
        Qn, _ = cholqr2(X)
        return jnp.concatenate([Qp[:, -1:], Qn], axis=1)

    Qp = lax.fori_loop(0, blocks, body, Q0)
    return jnp.sum(Qp[:, -1])


@partial(jax.jit, static_argnames=("s", "blocks"))
def _ca_chain_ilv(Ailv, Q0: jax.Array, s: int, blocks: int):
    """_ca_chain on the interleaved-layout carrier: the whole chain state
    lives in the permuted space (CGS/CholQR2 are permutation-invariant),
    powers ride the ilv kernel — the current headline generation."""
    from ca_lanczos_tpu.ops.pallas_ilv import _ilv_interpret, dia_powers_ilv
    from ca_lanczos_tpu.ops.qr import cholqr2

    coefs = jnp.zeros((s, 2), Q0.dtype)

    def powers(q):
        V2, _ = dia_powers_ilv(
            Ailv.dflat, q, coefs, Ailv.offsets, s, Ailv.tq, Ailv.n_rows,
            interpret=_ilv_interpret(), with_coefs=True,
        )
        return jnp.concatenate([q[:, None], V2.T], axis=1)

    def body(i, Qp):
        V = powers(Qp[:, -1])
        X = V[:, 1:]
        for _ in range(2):
            X = X - Qp @ (Qp.T @ X)
        Qn, _ = cholqr2(X)
        return jnp.concatenate([Qp[:, -1:], Qn], axis=1)

    Qp = lax.fori_loop(0, blocks, body, Q0)
    return jnp.sum(Qp[:, -1])


@partial(jax.jit, static_argnames=("s", "blocks"))
def _ca_chain_ilv_rm(Ailv, Q0r: jax.Array, s: int, blocks: int):
    """Row-major (m, n) variant of _ca_chain_ilv: the powers kernel's
    native (s, n) output chains straight into row-major CGS/CholQR —
    no (n, s+1) transpose per block (ROADMAP item: the 0.85 ms/block
    boundary copy).  Q0r is (s+1, n)."""
    from ca_lanczos_tpu.ops.pallas_ilv import _ilv_interpret, dia_powers_ilv
    from ca_lanczos_tpu.ops.qr import _chol_safe

    coefs = jnp.zeros((s, 2), Q0r.dtype)

    def cholqr2_rm(X):  # X (k, n) row-major; Q = L^-1 X
        for _ in range(2):
            G = X @ X.T
            L = _chol_safe(G)
            X = jax.scipy.linalg.solve_triangular(L, X, lower=True)
        return X

    def body(i, Qp):  # Qp (s+1, n)
        V2, _ = dia_powers_ilv(
            Ailv.dflat, Qp[-1], coefs, Ailv.offsets, s, Ailv.tq,
            Ailv.n_rows, interpret=_ilv_interpret(), with_coefs=True,
        )
        X = V2  # (s, n)
        for _ in range(2):
            X = X - (X @ Qp.T) @ Qp
        Qn = cholqr2_rm(X)
        return jnp.concatenate([Qp[-1:], Qn], axis=0)

    Qp = lax.fori_loop(0, blocks, body, Q0r)
    return jnp.sum(Qp[-1])


def measure_ca_iteration_throughput(
    A: DiaMatrix,
    s: int = 8,
    blocks_lo: int = 2,
    blocks_hi: int = 10,
    trials: int = 3,
    use_pallas: bool = True,
    kernel: str = "roll",
) -> float:
    """CA-Lanczos iterations/second (one iteration = s SpMVs + block orth),
    fully fused on device with latency-cancelled timing — the
    'iters/sec vs s' north-star metric (BASELINE.md).  kernel: "roll"
    (round-1/2 fused layout), "ilv" (interleaved, the current headline
    generation; state chained in the permuted space), or "ilv_rm"
    (interleaved + row-major basis: no per-block transpose)."""
    n = A.n
    rng = np.random.default_rng(0)
    Q0h = np.linalg.qr(rng.standard_normal((n, s + 1)))[0].astype(A.dtype)
    if kernel in ("ilv", "ilv_rm"):
        # All layout work stays on host (device fetch through the relay
        # is ~160 KB/s); only the final encoded block ships.
        from ca_lanczos_tpu.ops.pallas_ilv import IlvDiaMatrix, ilv_encode

        Ailv = IlvDiaMatrix.from_dia(A, keep_dia=False)
        enc = np.stack([ilv_encode(Q0h[:, j]) for j in range(s + 1)], 1)
        if kernel == "ilv_rm":
            Q0 = jnp.asarray(np.ascontiguousarray(enc.T))
            chain = lambda blocks: float(_ca_chain_ilv_rm(Ailv, Q0, s, blocks))
        else:
            Q0 = jnp.asarray(enc)
            chain = lambda blocks: float(_ca_chain_ilv(Ailv, Q0, s, blocks))
    else:
        Q0 = jnp.asarray(Q0h)
        try:
            float(_ca_chain(A, Q0, s, blocks_lo, use_pallas))
        except Exception:
            use_pallas = False
        chain = lambda blocks: float(_ca_chain(A, Q0, s, blocks, use_pallas))
    chain(blocks_lo)
    chain(blocks_hi)

    def timed(blocks):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            chain(blocks)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_hi, t_lo = timed(blocks_hi), timed(blocks_lo)
    dt = t_hi - t_lo
    if dt <= 0:  # timing noise beat the latency-cancellation margin
        return blocks_hi / t_hi
    return (blocks_hi - blocks_lo) / dt
