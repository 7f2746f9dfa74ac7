from ca_lanczos_tpu.harness.records import RunRecord, write_records, read_records
from ca_lanczos_tpu.harness.matrix_info import matrix_info, recommend_solver
from ca_lanczos_tpu.harness.auto import AutoResult, solve_auto
from ca_lanczos_tpu.harness.experiments import (
    run_propagation_experiment,
    run_restart_sweep,
    run_convergence_experiment,
)

__all__ = [
    "RunRecord",
    "write_records",
    "read_records",
    "matrix_info",
    "recommend_solver",
    "AutoResult",
    "solve_auto",
    "run_propagation_experiment",
    "run_restart_sweep",
    "run_convergence_experiment",
]
