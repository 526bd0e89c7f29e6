"""Test harness configuration.

Tests run on CPU with 8 virtual devices (mirroring the reference CI's
cpu-only strategy, SURVEY.md §4) so multi-device sharding is exercised
without TPU hardware.  The container pins JAX to the 'axon' TPU tunnel via
`jax.config` in sitecustomize, so we override the platform back to cpu here
— conftest is imported before any test module touches `jax.devices()`.

Set SDTPU_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SDTPU_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def runtime8():
    """An 8-device (4 data × 2 model) mesh runtime on the virtual CPU mesh."""
    import jax
    from sdwebui_tpu.parallel.mesh import MeshRuntime

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return MeshRuntime.create(data=4, model=2)
