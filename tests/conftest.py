"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; convergence-parity tests need f64.
Both are CPU-only concerns — the real-TPU path is exercised by bench.py.

Environment gotcha (see memory/axon-env-quirks): this container's
sitecustomize imports jax at interpreter startup and pins
JAX_PLATFORMS=axon (a network-attached TPU). Setting env vars here is too
late — jax is already imported — so we update the live jax config instead;
backends are not initialized yet at conftest time, so this still wins.
"""

import os

# XLA reads XLA_FLAGS at backend creation (not jax import), so this is
# still early enough.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize — that's fine)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on small CPU
# hosts; cache compiled executables across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "distributed: spawns 2 jax.distributed CPU processes (slow)",
    )
