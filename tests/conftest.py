"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run anywhere (the driver separately dry-runs multi-chip compilation)."""

import os
import sys

# NJODE_TPU_TESTS=1 keeps the session's real backend (axon TPU) so the
# TPU-gated tests (in-kernel PRNG proofs etc.) can run on the chip:
#   NJODE_TPU_TESTS=1 pytest tests/test_fused_scan.py -k prng
_ON_TPU = os.environ.get("NJODE_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported (site hooks); env vars alone are then too late.
import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# the reference implementation (read-only) is used as a parity oracle in tests
REFERENCE_PATH = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_PATH, "NJODE"))


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


# --- smoke tier -----------------------------------------------------------
# Tests measured >= ~20s on this 1-core box are listed (by nodeid) in
# tests/slow_tests.txt and marked 'slow' at collection; `pytest -m "not
# slow"` is the <5-min smoke tier, the bare run stays the full suite.
# Regenerate after adding tests:
#   python -m pytest tests/ -q --durations=0 > /tmp/durations.txt
#   python scripts/update_slow_marks.py /tmp/durations.txt
_SLOW_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    import pytest
    if not os.path.exists(_SLOW_FILE):
        # without the list, `-m "not slow"` deselects NOTHING and the
        # "smoke tier" silently runs the full ~50-min suite (ADVICE r4)
        if config.getoption("-m", default=""):
            import warnings
            warnings.warn(
                "tests/slow_tests.txt is missing: no tests carry the "
                "'slow' mark, so `-m 'not slow'` runs the FULL suite. "
                "Regenerate it (see scripts/update_slow_marks.py).")
        return
    with open(_SLOW_FILE) as f:
        slow = {ln.strip() for ln in f if ln.strip()
                and not ln.startswith("#")}
    for item in items:
        # nodeids are recorded without parametrization so one entry
        # covers every variant of a parametrized slow test
        base = item.nodeid.split("[")[0]
        if item.nodeid in slow or base in slow:
            item.add_marker(pytest.mark.slow)


# --- incremental duration log ----------------------------------------------
# `--durations=0` prints its table only at the END of the run, so a late
# native crash (the round-5 XLA-CPU compile segfault at ~95%) loses every
# duration. With NJODE_DURATIONS_LOG=<path> set, each test's setup/call/
# teardown duration is APPENDED (line-buffered) as it finishes:
#   NJODE_DURATIONS_LOG=/tmp/durations.txt python -m pytest tests/ -q
#   python scripts/update_slow_marks.py /tmp/durations.txt
# The line format matches the --durations table, so update_slow_marks.py
# parses both sources unchanged.
_DUR_LOG = os.environ.get("NJODE_DURATIONS_LOG")


def pytest_runtest_logreport(report):
    if _DUR_LOG and report.when in ("setup", "call"):
        with open(_DUR_LOG, "a") as f:
            f.write(f"{report.duration:.2f}s {report.when:8s} "
                    f"{report.nodeid}\n")
