"""Shared Mosaic-kernel trace helpers."""

from contextlib import nullcontext

import numpy as np


def x64_trace_off(dtype=None):
    """Context manager: trace a pallas_call with x64 disabled.

    The TPU kernels are f32/i32 throughout regardless of the process-wide
    x64 setting, but under jax_enable_x64 bare Python ints bind as
    weak-typed i64 literals, and Mosaic's convert-element-type lowering
    rule (jax 0.9) recurses without bound on any 64-bit convert.
    Tracing the kernel body inside this context keeps every literal at
    32 bits, which lets the mixed-precision drivers (f64 host/Gram math,
    x64 process) still run the Pallas compute path.

    Pass the kernel's operand ``dtype``: 64-bit operands (interpret-mode
    f64 parity tests) must trace normally — their f64 constants would
    otherwise truncate to f32 — and Mosaic never sees them.
    """
    if dtype is not None and np.dtype(dtype).itemsize == 8:
        return nullcontext()
    from jax._src import config as _cfg

    return _cfg.enable_x64(False)
