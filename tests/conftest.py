"""Test configuration: force CPU platform with a virtual 8-device mesh.

Mirrors the reference's test posture (unit tests run without a GPU —
``zig test`` on the math lib, reference SURVEY.md §4) but extends it: multi-chip
tile sharding is validated on a virtual CPU mesh, the standard JAX pattern for
testing distributed code without a real cluster.

NOTE: the execution environment pre-sets JAX_PLATFORMS to the TPU tunnel and
its plugin overrides the env var, so the platform must be forced through
jax.config (before any backend is touched).

Hardware subset: ``ZRENDERER_TPU_TESTS=1 python -m pytest tests/ -m tpu``
runs the @pytest.mark.tpu tests on the real chip (no CPU forcing); without
the env var every test runs on the virtual CPU mesh and tpu-marked tests
skip themselves.
"""

import os

import pytest

RUN_ON_TPU = os.environ.get("ZRENDERER_TPU_TESTS", "") not in ("", "0")

if not RUN_ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not RUN_ON_TPU:
    jax.config.update("jax_platforms", "cpu")


RUN_EXPERIMENTS = os.environ.get("ZRENDERER_RUN_EXPERIMENTS", "") not in (
    "", "0"
)


def pytest_collection_modifyitems(config, items):
    if not RUN_EXPERIMENTS:
        skip_exp = pytest.mark.skip(
            reason="quarantined kernel experiment (set "
                   "ZRENDERER_RUN_EXPERIMENTS=1 to run)"
        )
        for item in items:
            if "experiments" in item.keywords:
                item.add_marker(skip_exp)
    if RUN_ON_TPU:
        return
    skip = pytest.mark.skip(
        reason="TPU hardware test (set ZRENDERER_TPU_TESTS=1 on a TPU host)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
