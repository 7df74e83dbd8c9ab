"""Test configuration: force an 8-virtual-device CPU JAX backend.

Tests never require TPU hardware; the multi-chip (shard_map) path is
exercised on a virtual 8-device CPU mesh exactly as the driver's
dryrun_multichip does. These env vars must be set before jax initializes.
"""

import os

# The axon TPU plugin (sitecustomize in PYTHONPATH) imports jax at
# interpreter startup and forces jax_platforms="axon,cpu"; override it via
# jax.config (env vars are already consumed) BEFORE any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
# Debug cross-check: device scan packing verifies the kernel-packed bit
# count against the host prediction before trusting known_bits.
os.environ.setdefault("DMMT_CHECK_BITS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_FIXTURES = Path("/root/reference/tests")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at module boundaries: with ~400 tests
    compiling hundreds of XLA:CPU programs in one process, the LLVM JIT
    eventually abort()s inside backend_compile (reproducibly at the
    same late test, which passes in isolation). Bounding the live
    executable count keeps the suite stable; cross-module program reuse
    is minor (most modules compile their own shapes)."""
    yield
    jax.clear_caches()


# Round 3 showed module-boundary clearing is not enough: a single module
# (test_onedispatch) grew past the crash threshold on its own. The bound
# must be per PROCESS, so ALSO clear every N tests regardless of module.
# N=10 keeps parametrized neighbors sharing programs most of the time
# while keeping the live-executable count far below the observed crash
# zone (the heavy modules compile ~10-30 executables/test).
_CLEAR_EVERY_N_TESTS = 10
_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _bound_live_executables_per_process():
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % _CLEAR_EVERY_N_TESTS == 0:
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def fixtures_dir():
    if not REFERENCE_FIXTURES.is_dir():
        pytest.skip("reference fixtures not available")
    return REFERENCE_FIXTURES
