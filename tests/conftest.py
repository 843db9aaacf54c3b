"""Test configuration: force CPU platform with a virtual 8-device mesh.

Mirrors the reference's test posture (unit tests run without a GPU —
``zig test`` on the math lib, reference SURVEY.md §4) but extends it: multi-chip
tile sharding is validated on a virtual CPU mesh, the standard JAX pattern for
testing distributed code without a real cluster.
"""

import os

# Must be set before jax is imported by any test module.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
