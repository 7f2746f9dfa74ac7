"""Refresh the north-star tables on the CURRENT kernel generation
(round-4 VERDICT item 7): "CA iters/sec vs s" and the runLanczos-parity
propagation timings were last measured on the round-1 roll kernel (~40%
below the ILV path).

Measures on the real chip with the two-point latency-cancelled protocol
(utils/profiling.py), 5 trials per point, both kernel generations for
the record.  Operator: the 4.2M x 9-diagonal bench operator
(BENCHMARKS.md "Matrix-powers kernel").

Usage: python -u exp/northstar_tables.py   -> results/northstar_tables.jsonl
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu.ops.spmv import DiaMatrix
from ca_lanczos_tpu.utils.profiling import measure_ca_iteration_throughput

T00 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T00:7.1f}s] {msg}", flush=True)


def bench_operator(n=1 << 22):
    """The bench.py headline operator: 4.2M rows x 9 contiguous
    diagonals (offsets -4..4), f32 — same operator as BENCHMARKS.md's
    matrix-powers table so rates are comparable."""
    offsets = tuple(range(-4, 5))
    rng = np.random.default_rng(0)
    data = rng.standard_normal((len(offsets), n)).astype(np.float32)
    return DiaMatrix(data=data, offsets=offsets)


def main():
    rows = []
    skip_tables = bool(os.environ.get("NSTAR_SKIP_TABLES"))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "northstar_tables.jsonl")
    if skip_tables and os.path.exists(out):
        # keep previously-measured table rows, re-measure propagation only
        rows = [json.loads(l) for l in open(out)
                if json.loads(l).get("table") != "propagation_runlanczos"]
    A = bench_operator()
    n, nd = A.data.shape[1], A.data.shape[0]
    log(f"operator {n} x {nd} diagonals ({n*nd/1e6:.1f}M nnz)")
    for s in () if skip_tables else (2, 4, 8, 16):
        for kernel in ("ilv_rm", "ilv", "roll"):
            trials = []
            for t in range(5):
                ips = measure_ca_iteration_throughput(
                    A, s=s, blocks_lo=2,
                    blocks_hi=max(6, int(120 / s)),
                    trials=1, kernel=kernel,
                )
                trials.append(ips)
            med = float(np.median(trials))
            rows.append(dict(
                table="ca_iters_per_s", kernel=kernel, s=s,
                iters_per_s=round(med, 1),
                krylov_steps_per_s=round(med * s, 1),
                spread=[round(min(trials), 1), round(max(trials), 1)],
                n=n, ndiags=nd,
            ))
            log(f"s={s} kernel={kernel}: {med:.1f} iters/s "
                f"({med*s:.0f} Krylov steps/s) spread "
                f"{min(trials):.1f}-{max(trials):.1f}")

    # runLanczos propagation experiment timing refresh (reference
    # runLanczos.m:1-5 config: N=512, dt=0.025, 200 steps, 24 Krylov
    # steps) on the current fused split propagator.
    from ca_lanczos_tpu.solvers.propagators import _propagate_split_fused
    from ca_lanczos_tpu.utils.matrices import gaussian_packet, harmonic_oscillator

    from ca_lanczos_tpu.ops.spmv import EllMatrix

    H, x = harmonic_oscillator(512)
    H32 = EllMatrix(vals=jnp.asarray(np.asarray(H.vals), jnp.float32),
                    cols=H.cols)
    # Split representation built on HOST numpy: complex dtypes are
    # unimplemented/hang on the axon TPU relay (memory/axon-tpu-quirks),
    # and the split path exists precisely to avoid them on device.
    psi_np = np.asarray(gaussian_packet(np.asarray(x)))
    psi = jnp.asarray(
        np.stack([psi_np.real, psi_np.imag], axis=1), jnp.float32
    )
    dt32 = jnp.asarray(0.025, jnp.float32)

    def run():
        out = _propagate_split_fused(H32, psi, dt32, 24, 200)
        jax.block_until_ready(out)
        return out

    run()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    rows.append(dict(
        table="propagation_runlanczos", n=512, dt=0.025, n_steps=200,
        krylov_dim=24, total_s=round(med, 4),
        per_step_ms=round(1e3 * med / 200, 3),
        spread_s=[round(min(ts), 4), round(max(ts), 4)],
        solver="propagate_split_fused",
    ))
    log(f"propagation: {med*1e3:.1f} ms total ({med*1e3/200:.2f} ms/step) "
        f"spread {min(ts)*1e3:.1f}-{max(ts)*1e3:.1f} ms")

    with open(out, "w") as f:
        for rec in rows:
            rec.setdefault("kernel_generation", "round-5 (ilv headline)")
            rec.setdefault("date", "2026-08-20")
            f.write(json.dumps(rec) + "\n")
    log(f"wrote {out}")


main()
