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

# ---------------------------------------------------------------------------
# Slow-test marking (measured, data-driven).  tests/slow_tests.txt lists the
# node ids that took >=10 s on the 8-device CPU mesh (pytest --durations
# output); they get the `slow` marker automatically so the documented dev
# loop `pytest -m "not slow"` stays under 5 minutes while `pytest tests/`
# still runs everything.  Regenerate with:
#   pytest tests/ -q --durations=0 | awk '$1+0>=10 && $2~/call|setup/
#     {print $3}' | sort -u > tests/slow_tests.txt
_SLOW_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "slow_tests.txt")
try:
    with open(_SLOW_FILE, encoding="utf-8") as _f:
        _SLOW_IDS = {ln.strip() for ln in _f if ln.strip()}
except OSError:
    _SLOW_IDS = set()


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def runtime8():
    """An 8-device (4 data × 2 model) mesh runtime on the virtual CPU mesh."""
    import jax
    from sdwebui_tpu.parallel.mesh import MeshRuntime

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return MeshRuntime.create(data=4, model=2)
