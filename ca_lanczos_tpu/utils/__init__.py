from ca_lanczos_tpu.utils.matrices import (
    diag_spectrum,
    laplacian_1d,
    laplacian_2d,
    harmonic_oscillator,
    gaussian_packet,
)
from ca_lanczos_tpu.utils.diagnostics import (
    ritz_residual_norms,
    orth_error_fro,
    orth_error_block,
    OmegaRecurrence,
)

__all__ = [
    "diag_spectrum",
    "laplacian_1d",
    "laplacian_2d",
    "harmonic_oscillator",
    "gaussian_packet",
    "ritz_residual_norms",
    "orth_error_fro",
    "orth_error_block",
    "OmegaRecurrence",
]
