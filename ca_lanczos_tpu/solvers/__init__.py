from ca_lanczos_tpu.solvers.lanczos import lanczos, LanczosResult
from ca_lanczos_tpu.solvers.ca_lanczos import (
    ca_lanczos,
    CaLanczosResult,
    build_basis_matrix,
    monomial_basis_matrix,
    newton_shifts_bootstrap,
)
from ca_lanczos_tpu.solvers.propagators import (
    lanczos_prop,
    ca_lanczos_prop,
    propagate,
    PropResult,
    lanczos_prop_split,
    propagate_split,
    propagate_split_fused,
    SplitPropResult,
)
from ca_lanczos_tpu.solvers.sstep import sstep_lanczos, sstep_lanczos_prop, SstepResult
from ca_lanczos_tpu.solvers.arnoldi import arnoldi
from ca_lanczos_tpu.solvers.implicitly_restarted import (
    impl_restarted_ca_lanczos,
    IRLResult,
    qrstep,
)
from ca_lanczos_tpu.solvers.fused_restarted import (
    fused_restarted_ca_lanczos,
    FusedRestartedResult,
)
from ca_lanczos_tpu.solvers.restarted import (
    restarted_lanczos,
    restarted_ca_lanczos,
    RestartedResult,
)

__all__ = [
    "lanczos",
    "LanczosResult",
    "ca_lanczos",
    "CaLanczosResult",
    "build_basis_matrix",
    "monomial_basis_matrix",
    "newton_shifts_bootstrap",
    "restarted_lanczos",
    "restarted_ca_lanczos",
    "RestartedResult",
    "fused_restarted_ca_lanczos",
    "FusedRestartedResult",
    "lanczos_prop",
    "ca_lanczos_prop",
    "propagate",
    "PropResult",
    "lanczos_prop_split",
    "propagate_split",
    "propagate_split_fused",
    "SplitPropResult",
    "sstep_lanczos",
    "sstep_lanczos_prop",
    "SstepResult",
    "arnoldi",
    "impl_restarted_ca_lanczos",
    "IRLResult",
    "qrstep",
]
