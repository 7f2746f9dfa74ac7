"""Test configuration: 8 virtual CPU devices + float64.

Multi-device tests simulate the TPU mesh on CPU via
``xla_force_host_platform_device_count`` (SURVEY.md section 4); parity
tests against the float64 MATLAB reference require x64.

NOTE: jax may already be imported (site customization registers the TPU
plugin at interpreter start), so we switch platform via jax.config rather
than env vars, and set XLA_FLAGS before the CPU backend is instantiated.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
