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
