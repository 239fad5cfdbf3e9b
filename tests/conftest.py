"""Test harness configuration.

Mirrors the reference harness parametrization (test/conftest.py:1-18:
--dtype × --model options) and runs JAX on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4.4).
"""

import os

# TPULAMM_TEST_TPU=1 keeps the real backend (for the on-hardware exactness
# suite, tests/test_tpu_exactness.py); default is the CPU virtual mesh.
_ON_TPU = os.environ.get("TPULAMM_TEST_TPU") == "1"

if not _ON_TPU:
    # XLA_FLAGS must be in the env before the CPU client is created (lazy).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already be imported (site customization registers TPU plugins and
# pins JAX_PLATFORMS in the env), so force the platform via the live config —
# backends initialize lazily, so this wins as long as no device was touched.
import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

ALL_DTYPES = ["f32", "q2_k", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]


def pytest_addoption(parser):
    parser.addoption("--dtype", action="append", default=[],
                     help="quant dtypes to test (default: all)")
    parser.addoption("--model", action="append", default=[],
                     help="model fixture names to test")


def pytest_generate_tests(metafunc):
    if "dtype" in metafunc.fixturenames:
        dtypes = metafunc.config.getoption("dtype") or ALL_DTYPES
        metafunc.parametrize("dtype", dtypes)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
