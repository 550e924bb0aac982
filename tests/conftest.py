"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; convergence-parity tests need f64.
Both are CPU-only concerns — the real-TPU path is exercised by bench.py.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
