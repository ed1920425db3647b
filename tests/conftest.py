"""Test configuration: force CPU with 8 virtual devices.

The container may pre-register a TPU backend (axon) and pin
JAX_PLATFORMS=axon at the interpreter level; tests run on CPU regardless —
deterministic, tunnel-free, and with 8 virtual devices for the mesh tests.
The real chip is exercised by bench.py and the driver's entry points.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("H2A_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big scans (scalar_mul, inv) compile once
# per machine instead of once per pytest run.
jax.config.update("jax_compilation_cache_dir", "/tmp/h2a_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
