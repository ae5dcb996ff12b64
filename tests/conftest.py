"""Test configuration: run everything on a virtual 8-device CPU backend so
tests are hermetic (no TPU needed) and sharding paths are exercised — the
standard JAX fake-backend pattern (SURVEY.md §4).

This environment pins a TPU PJRT plugin at interpreter startup (sitecustomize
registers the 'axon' backend when PALLAS_AXON_POOL_IPS is set), which makes
JAX_PLATFORMS=cpu ineffective once python is running.  To stay hermetic we
re-exec pytest once with the plugin disabled and the CPU device-count flag
set; the guard env var prevents a loop.
"""

import os
import sys

_GUARD = "TPU_VITERBI_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_GUARD) == "1":
        return False
    # TPU plugin pinned at startup -> JAX_PLATFORMS=cpu won't take effect
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def pytest_configure(config):
    if not _needs_reexec():
        return
    # restore the real stdout/stderr fds before exec'ing, else all output of
    # the new process lands in pytest's (about-to-die) capture temp files
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""   # sitecustomize skips TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    args = [sys.executable, "-m", "pytest"] + list(
        config.invocation_params.args)
    os.execvpe(sys.executable, args, env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the slow tier too (interpret-mode Pallas compiles and "
             "multi-process tests, each 60-200 s; also enabled by "
             "TPU_VITERBI_FULL_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r4 item 5): the default run must stay
    under ~10 min so the 'keep tests green' gate is actually run; the
    ~10 slowest tests (dominated by interpret-mode Pallas kernel
    compiles, each covering a contract that also has a faster guard)
    form the `slow` tier, run by `pytest tests/ --full` and the
    on-hardware qualification battery (tests_tpu/)."""
    if config.getoption("--full") or \
            os.environ.get("TPU_VITERBI_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: run with --full (or "
                            "TPU_VITERBI_FULL_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
