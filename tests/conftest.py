"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual device mesh (no multi-chip
hardware in CI); the driver separately dry-runs the multichip path via
__graft_entry__.dryrun_multichip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the big scans (scalar_mul, inv) compile once
# per machine instead of once per pytest run.
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/h2a_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
