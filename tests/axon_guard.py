"""Pytest pre-capture guard: strip the axon TPU plugin from test processes.

Loaded via ``addopts = -p tests.axon_guard`` (pyproject.toml) BEFORE pytest
starts output capture, so the re-exec below keeps stdout/stderr attached.

Why: sitecustomize registers the axon PJRT plugin whenever
PALLAS_AXON_POOL_IPS is set; with the TPU tunnel unreachable, any jax
backend probe in a test process then retries for ~25 min and wedges the
suite (measured: 6 tests in 64 min).  Tests never use the real chip — it
is reserved for bench.py — so test interpreters simply must not register
the plugin.  Clearing the env var inside conftest.py is too late
(sitecustomize already ran), hence the re-exec.  Subprocess-spawning tests
inherit the cleaned environment automatically.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    os.environ.pop("PALLAS_AXON_POOL_IPS")
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])
