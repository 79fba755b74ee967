"""Test environment: virtual 8-device CPU mesh.

The reference can only test its distributed schedules on 8 real GPUs under
torchrun (reference test/test.sh). On JAX we instead run every distributed
test on a virtual 8-device CPU mesh via
``--xla_force_host_platform_device_count=8`` — no hardware needed
(SURVEY.md §4). The environment pins JAX_PLATFORMS=axon (the TPU tunnel), so
we must both set XLA_FLAGS before any backend initialization *and* switch the
platform to cpu via jax.config.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
