"""Numerical-debug utilities — the single-process stand-in for race
detection / sanitizers (SURVEY.md section 5): deterministic-collective
checks, cross-device consistency assertions, and NaN guards.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def assert_finite(tree, where: str = "") -> None:
    """Host-side NaN/Inf guard over a pytree of arrays."""
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            bad = int(np.sum(~np.isfinite(arr)))
            raise FloatingPointError(f"{bad} non-finite values {('in ' + where) if where else ''}")


def check_deterministic(fn: Callable, *args, reps: int = 2) -> bool:
    """Run fn twice and require bitwise-identical outputs — the
    deterministic-collective test: psum/all_gather orders must be stable
    for restart trajectories to be reproducible."""
    ref = jax.tree_util.tree_map(np.asarray, fn(*args))
    for _ in range(reps - 1):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
        ok = jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: np.array_equal(a, b), ref, out)
        )
        if not ok:
            return False
    return True


def cross_device_consistency(x: jax.Array, atol: float = 0.0) -> float:
    """Max deviation of a nominally-replicated array across its shards.

    0.0 means every device holds identical bytes; a nonzero value flags a
    non-deterministic collective or divergent replicated compute."""
    shards = [np.asarray(s.data) for s in x.addressable_shards]
    if len(shards) < 2:
        return 0.0
    ref = shards[0]
    dev = max(float(np.max(np.abs(s - ref))) if s.size else 0.0 for s in shards[1:])
    if atol and dev > atol:
        raise AssertionError(f"cross-device deviation {dev} > {atol}")
    return dev
