"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual CPU mesh — the TPU equivalent of a
fake backend (the single real TPU chip behind the axon tunnel is reserved for
bench.py).  Must run before the first jax import.
"""

import os
import sys

# tests/axon_guard.py (loaded pre-capture via pyproject addopts) re-execs
# the interpreter with the axon TPU plugin disabled; by the time this
# conftest imports, PALLAS_AXON_POOL_IPS is already cleared.  Belt-and-
# braces for direct invocations that bypass pyproject (e.g. pytest -c): a
# late re-exec here would lose captured output, so just scrub the env for
# any subprocesses and force the CPU backend below.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# the axon TPU plugin registers itself at interpreter startup and wins over
# the env vars; force the CPU backend explicitly before it initializes
jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def pretrained_tcnn_path():
    path = os.path.join(REFERENCE_DIR, "pretrained", "pointnet_tcnn.ckpt")
    if not os.path.exists(path):
        pytest.skip("reference pretrained checkpoint not available")
    return path


@pytest.fixture(scope="session")
def pretrained_torch_path():
    path = os.path.join(REFERENCE_DIR, "pretrained", "pointnet.ckpt")
    if not os.path.exists(path):
        pytest.skip("reference pretrained checkpoint not available")
    return path


# ---------------------------------------------------------------------------
# quick-subset markers (VERDICT round-3 weak item 6: the 27-min full suite is
# the gate; `pytest -m quick` selects the measured-fast subset for iteration)
# ---------------------------------------------------------------------------

_DURATIONS_PATH = os.path.join(os.path.dirname(__file__), "durations.json")
_QUICK_CUTOFF_S = 5.0


def pytest_collection_modifyitems(config, items):
    """Mark tests whose recorded call time is < 5 s as `quick`.

    Durations come from tests/durations.json (regenerate with
    BNV_WRITE_DURATIONS=1 on a full run).  Tests with no recorded duration
    (new tests) default to quick — a new slow test gets reclassified the
    next time durations are regenerated."""
    import json

    try:
        with open(_DURATIONS_PATH) as f:
            durations = json.load(f)
    except OSError:
        durations = {}
    for item in items:
        if durations.get(item.nodeid, 0.0) < _QUICK_CUTOFF_S:
            item.add_marker(pytest.mark.quick)


def pytest_runtest_logreport(report):
    """With BNV_WRITE_DURATIONS=1, accumulate per-test call durations into
    tests/durations.json (merged, so partial runs only update their own)."""
    if report.when != "call" or not os.environ.get("BNV_WRITE_DURATIONS"):
        return
    import json

    try:
        with open(_DURATIONS_PATH) as f:
            durations = json.load(f)
    except OSError:
        durations = {}
    durations[report.nodeid] = round(report.duration, 3)
    with open(_DURATIONS_PATH, "w") as f:
        json.dump(durations, f, indent=0, sort_keys=True)
