"""Headline benchmark: SpMV throughput (nnz/s/chip) inside the CA-Lanczos
matrix-powers kernel — the hot kernel of the whole framework
(BASELINE.md north-star metric; the MATLAB reference publishes no numbers,
so vs_baseline is reported against the recorded best of previous rounds
in BENCH_BEST.json when available, else 1.0).

Measurement notes: host<->device calls through the axon relay carry
~30 ms fixed latency and ``block_until_ready`` does not reliably fence, so
the benchmark (a) chains all work inside ONE jitted fori_loop, (b) forces
a scalar readback, and (c) cancels the fixed call latency with a
two-point (reps_lo, reps_hi) measurement.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time
from functools import partial

import jax

# Persistent compilation cache: first-compile of the kernels through the
# remote compile helper costs minutes; cached reruns take seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax


@partial(jax.jit, static_argnames=("s", "path", "Tq", "n", "offsets"))
def _powers_chain(A, q, s, reps, path="ilv", Tq=16384, n=0, offsets=None):
    # reps is TRACED (dynamic fori_loop trip count): one compile serves
    # every rep count, so raising the two-point spread costs nothing.
    if path == "ilv":
        # Interleaved-layout fused kernel (ops.pallas_ilv): rows
        # J-interleaved so the per-step stencil reads are aligned
        # streams; q is pre-encoded by the caller and the chained last
        # vector stays interleaved (the layout is invisible to the
        # reduction).  648 vs 472 Gnnz/s for the roll-based kernel on
        # this operator (exp/fused_ilv.py, 2026-08-19).
        from ca_lanczos_tpu.ops.pallas_ilv import dia_powers_ilv

        coefs = jnp.zeros((s, 2), q.dtype)

        def body(i, v):
            _, last = dia_powers_ilv(
                A, v, coefs, offsets, s, Tq, n, with_coefs=False
            )
            return last

        return jnp.sum(lax.fori_loop(0, reps, body, q))

    if path == "fused":
        from ca_lanczos_tpu.ops.pallas_spmv import _dia_powers_fused, dia_flat_padded

        wmax = max(abs(o) for o in A.offsets)
        W = ((s * wmax + 1023) // 1024) * 1024
        dflat = dia_flat_padded(A, W)  # hoisted out of the loop by XLA
        coefs = jnp.zeros((s, 2), q.dtype)

        def body(i, v):
            # Monomial powers: the shift corrections compile out.
            _, last = _dia_powers_fused(dflat, v, coefs, A.offsets, s, with_coefs=False)
            return last

        v = lax.fori_loop(0, reps, body, q)
        return jnp.sum(v)

    from ca_lanczos_tpu.ops.matrix_powers import matrix_powers_monomial

    def body(i, v):
        return matrix_powers_monomial(A, v, s)[:, s]

    return jnp.sum(lax.fori_loop(0, reps, body, q))


def _watchdog(seconds: float):
    """Emit an honest failure record and hard-exit if the device never
    responds (the axon relay has been observed to hang indefinitely on
    the first device_put during outages — a silent hang would stall the
    whole capture; a recorded error is diagnosable)."""
    import os
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "matrix_powers_spmv_throughput",
                    "value": 0.0,
                    "unit": "Gnnz/s/chip",
                    "vs_baseline": 0.0,
                    "error": f"device unresponsive for {seconds:.0f}s "
                             "(relay outage?)",
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    from ca_lanczos_tpu.ops.spmv import DiaMatrix

    # Disarmed after the first successful device round-trip; generous
    # enough for a cold compile through the remote helper.
    wd = _watchdog(1200.0)

    # Banded SPD operator, ~4M rows x 9 diagonals (~37.7M nnz), f32: the
    # shape-family of the reference corpus (banded Laplacians/Hamiltonians)
    # at production scale.  Scaled to spectral norm ~1 so chained powers
    # stay bounded without renormalization.
    n = 1 << 22
    offsets = tuple(range(-4, 5))
    ndiags = len(offsets)
    rng = np.random.default_rng(0)
    data = np.asarray(rng.standard_normal((ndiags, n)), np.float32) * 0.02
    data[ndiags // 2] += 0.8
    A = DiaMatrix(data=jnp.asarray(data), offsets=offsets)
    s = 8
    nnz = A.nnz

    qf = np.asarray(rng.standard_normal(n), np.float32)
    qf /= np.linalg.norm(qf)

    reps_lo, reps_hi = 20, 220
    # Kernel preference order: interleaved-layout fused (fastest) ->
    # roll-based fused -> XLA lowering.  Each fallback is loud: a
    # lowering regression must be visible in the captured output, not
    # disguised as a slow-but-valid number.
    import sys
    import traceback

    Tq = 16384  # nq = n/8 = 512k -> 32 tiles
    candidates = []
    try:
        from ca_lanczos_tpu.ops.pallas_ilv import ilv_data_tiled, ilv_encode

        dfl = jnp.asarray(ilv_data_tiled(A, Tq))
        q_il = jnp.asarray(ilv_encode(qf))
        candidates.append(
            ("ilv", dict(A=dfl, q=q_il, path="ilv", Tq=Tq, n=n, offsets=offsets))
        )
    except Exception as e:
        print(f"WARNING: ilv encode failed: {e!r}", file=sys.stderr)
    q0 = jnp.asarray(qf)
    candidates.append(("fused", dict(A=A, q=q0, path="fused")))
    candidates.append(("xla", dict(A=A, q=q0, path="xla")))

    path = None
    for name, kw in candidates:
        try:
            float(_powers_chain(kw["A"], kw["q"], s, jnp.int32(reps_lo),
                                path=kw["path"], Tq=kw.get("Tq", 16384),
                                n=kw.get("n", 0), offsets=kw.get("offsets")))
            path, pkw = name, kw
            break
        except Exception as e:
            print(f"WARNING: {name} path failed, falling back: {e!r}",
                  file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
    if path is None:
        print(
            json.dumps(
                {
                    "metric": "matrix_powers_spmv_throughput",
                    "value": 0.0,
                    "unit": "Gnnz/s/chip",
                    "vs_baseline": 0.0,
                    "error": "all kernel paths failed to compile/run",
                }
            )
        )
        return
    # Warm up (single compile; reps is traced).
    float(_powers_chain(pkw["A"], pkw["q"], s, jnp.int32(reps_hi),
                        path=pkw["path"], Tq=pkw.get("Tq", 16384),
                        n=pkw.get("n", 0), offsets=pkw.get("offsets")))
    wd.cancel()  # device is alive; timing from here is bounded

    def timed(reps, trials=3):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(_powers_chain(pkw["A"], pkw["q"], s, jnp.int32(reps),
                                path=pkw["path"], Tq=pkw.get("Tq", 16384),
                                n=pkw.get("n", 0), offsets=pkw.get("offsets")))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # Multiple independent two-point estimates put the shared-chip spread
    # on the record instead of a single (possibly lucky/unlucky) capture.
    estimates = []
    for _ in range(5):
        t_lo, t_hi = timed(reps_lo), timed(reps_hi)
        estimates.append(nnz * s * (reps_hi - reps_lo) / (t_hi - t_lo) / 1e9)
    estimates.sort()
    gnnz_per_s = estimates[len(estimates) // 2]  # median

    try:
        with open("BENCH_BEST.json") as f:
            best = json.load(f)["value"]  # Gnnz/s from a previous round
        vs = gnnz_per_s / best
    except Exception:
        vs = 1.0

    print(
        json.dumps(
            {
                "metric": "matrix_powers_spmv_throughput",
                "value": round(gnnz_per_s, 4),
                "unit": "Gnnz/s/chip",
                "vs_baseline": round(vs, 4),
                "spread_min": round(estimates[0], 1),
                "spread_max": round(estimates[-1], 1),
                "trials": len(estimates),
                "path": path,
            }
        )
    )


if __name__ == "__main__":
    main()
