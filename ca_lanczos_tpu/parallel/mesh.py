"""Device mesh construction for row-sharded CA-Lanczos.

The meaningful parallel axis for this workload is the matrix row dimension
(SURVEY.md section 2b): vectors and Krylov multivectors are sharded over a
1-D ``('rows',)`` mesh; the matrix-powers kernel exchanges s-deep halos
over ICI (``ppermute``) and all reductions (Gram matrices, TSQR R factors,
norms) ride ``psum``/``all_gather``.

For multi-host pods, initialize ``jax.distributed`` before calling
``make_mesh``; the mesh then spans all global devices, with halo traffic
between neighboring shards staying on ICI when the row order follows the
device order.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

ROWS = "rows"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the row axis.

    n_devices defaults to all visible devices.  Multi-dimensional meshes
    (host x chip) are expressed by the caller reordering ``devices`` so
    that ring neighbors are ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROWS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (n, ...) arrays split along rows."""
    return NamedSharding(mesh, PartitionSpec(ROWS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
