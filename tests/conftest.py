"""Test config: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are exercised on CPU via
``xla_force_host_platform_device_count`` (SURVEY.md §4 test plan); the
real TPU is reserved for bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep CI deterministic and fast
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def waveform_dir():
    path = "/root/reference/test_data/waveforms"
    if not os.path.isdir(path):
        pytest.skip("reference waveform fixtures unavailable")
    return path
