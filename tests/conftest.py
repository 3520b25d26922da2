"""Test configuration.

Tests run on the host CPU backend with 8 virtual devices so multi-chip sharding
semantics are exercised without TPU hardware (SURVEY.md §4: pod-slice semantics
via xla_force_host_platform_device_count fake devices).

Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
plugin at interpreter startup and forces jax_platforms to it; we must override
the *config* (not just the env var) to get a genuinely local CPU backend —
otherwise every compile becomes a slow remote-TPU RPC.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules: this image's XLA
    CPU compiler segfaults after enough distinct programs accumulate in
    one process (observed in backend_compile_and_load at ~the 450th
    compile of a combined test_parity+test_parallel run; each file
    passes in isolation). Clearing per module keeps a full-suite
    single-process run viable."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0xEB37)
