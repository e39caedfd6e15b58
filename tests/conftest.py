"""Test harness configuration.

Tests run on CPU with 8 simulated devices so the multi-chip sharding path
is exercised without TPU hardware (SURVEY.md section 4 item 4).  The env
vars must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
