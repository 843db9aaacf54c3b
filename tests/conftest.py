"""Test configuration: force CPU platform with a virtual 8-device mesh.

Mirrors the reference's test posture (unit tests run without a GPU —
``zig test`` on the math lib, reference SURVEY.md §4) but extends it: multi-chip
tile sharding is validated on a virtual CPU mesh, the standard JAX pattern for
testing distributed code without a real cluster.

NOTE: the execution environment pre-sets JAX_PLATFORMS to the TPU tunnel and
its plugin overrides the env var, so the platform must be forced through
jax.config (before any backend is touched).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
