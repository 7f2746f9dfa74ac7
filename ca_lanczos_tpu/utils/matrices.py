"""Synthetic operator builders mirroring the reference's test fixtures.

* ``diag_spectrum`` — diag(linspace(1, 10^k, N)): exactly-known spectra
  (test_convergence_diagonal_matrices.m:9-21,
  test_restart_diagonal_matrices.m:8-26).
* ``laplacian_1d`` / ``laplacian_2d`` — banded FD Laplacians, the
  structured stand-ins for the SuiteSparse corpus families.
* ``harmonic_oscillator`` — the 1-D quantum harmonic oscillator
  Hamiltonian with 4th-order periodic finite differences
  (runLanczos.m:15-18), used by the propagation experiments.
* ``gaussian_packet`` — the displaced Gaussian wave packet
  (runLanczos.m:20-21).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ca_lanczos_tpu.ops.spmv import DiaMatrix, EllMatrix


def diag_spectrum(n: int, lo: float = 1.0, hi: float = 100.0, dtype=jnp.float64) -> DiaMatrix:
    """A = diag(linspace(lo, hi, n)); eigenvalues known exactly."""
    d = jnp.linspace(lo, hi, n, dtype=dtype)
    return DiaMatrix(data=d[None, :], offsets=(0,))


def laplacian_1d(n: int, dtype=jnp.float64) -> DiaMatrix:
    """Standard 3-point 1-D Laplacian (tridiag [-1, 2, -1]), SPD."""
    main = jnp.full((n,), 2.0, dtype=dtype)
    lower = jnp.zeros((n,), dtype=dtype).at[1:].set(-1.0)  # data[d,i] = A[i,i-1]
    upper = jnp.zeros((n,), dtype=dtype).at[: n - 1].set(-1.0)
    return DiaMatrix(data=jnp.stack([lower, main, upper]), offsets=(-1, 0, 1))


def laplacian_2d(nx: int, ny: int, dtype=jnp.float64) -> DiaMatrix:
    """5-point 2-D Laplacian on an nx-by-ny grid (row-major), SPD.

    Offsets (-nx, -1, 0, 1, nx); the +/-1 diagonals are zeroed at grid-row
    boundaries.
    """
    n = nx * ny
    i = np.arange(n)
    main = np.full(n, 4.0)
    west = np.where(i % nx != 0, -1.0, 0.0)  # A[i, i-1]
    east = np.where((i + 1) % nx != 0, -1.0, 0.0)  # A[i, i+1]
    south = np.where(i >= nx, -1.0, 0.0)  # A[i, i-nx]
    north = np.where(i < n - nx, -1.0, 0.0)  # A[i, i+nx]
    data = jnp.asarray(np.stack([south, west, main, east, north]), dtype=dtype)
    return DiaMatrix(data=data, offsets=(-nx, -1, 0, 1, nx))


def harmonic_oscillator(
    n: int = 512,
    x_range: Tuple[float, float] = (-10.0, 10.0),
    dtype=jnp.float64,
) -> Tuple[EllMatrix, np.ndarray]:
    """H = -(1/2) d2/dx2 (4th-order periodic FD) + x^2/2.

    Built exactly as runLanczos.m:7-18: off-diagonals 4/3 (distance 1) and
    -1/12 (distance 2) with periodic wrap, main diagonal -5/2, scaled by
    -1/(2 h^2), plus the potential 0.5 x^2 (runLanczos.m:18).
    Returns (H, x grid).

    Periodic wrap makes DIA unsuitable; the uniform 5 nnz/row maps
    perfectly onto ELL.
    """
    lo, hi = x_range
    h = (hi - lo) / n
    x = lo + h / 2 + h * np.arange(n)

    c1 = 4.0 / 3.0
    c2 = -1.0 / 12.0
    c0 = -5.0 / 2.0
    scale = -1.0 / (2.0 * h * h)

    i = np.arange(n)
    cols = np.stack(
        [(i - 2) % n, (i - 1) % n, i, (i + 1) % n, (i + 2) % n], axis=1
    ).astype(np.int32)
    vals = np.stack(
        [
            np.full(n, scale * c2),
            np.full(n, scale * c1),
            scale * c0 + 0.5 * x**2,
            np.full(n, scale * c1),
            np.full(n, scale * c2),
        ],
        axis=1,
    )
    H = EllMatrix(vals=jnp.asarray(vals, dtype=dtype), cols=jnp.asarray(cols))
    return H, x


def gaussian_packet(x: np.ndarray, width: float = 0.5, displacement: float = 4.0) -> np.ndarray:
    """psi = (1/(pi w^2))^(1/4) exp(-((x - d)/w)^2 / 2) (runLanczos.m:20-21)."""
    return (1.0 / (np.pi * width**2)) ** 0.25 * np.exp(-0.5 * ((x - displacement) / width) ** 2)
