"""Test configuration: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding is exercised without TPU hardware via XLA's
host-platform device-count override (SURVEY.md §5.8); the driver separately
dry-run-compiles the multi-chip path through ``__graft_entry__.dryrun_multichip``.
Set before any jax import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
