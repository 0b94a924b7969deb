"""Test config: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are exercised on CPU via
``xla_force_host_platform_device_count`` (SURVEY.md §4 test plan); the
real TPU is reserved for bench.py.
"""

import os

# force CPU: the ambient environment may point JAX_PLATFORMS at the real
# TPU (e.g. 'axon'), which would give bf16 matmuls, slow tunnel compiles,
# and no virtual multi-device mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep CI deterministic and fast
os.environ.setdefault("JAX_ENABLE_X64", "0")
# the axon sitecustomize force-registers the TPU backend at interpreter
# start regardless of JAX_PLATFORMS; override it in-process too
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture()
def rng():
    # function-scoped on purpose: a shared session stream made every
    # test's data depend on which tests ran before it (any -k selection
    # reshuffled the draws — test_bucketing once failed only in the full
    # run, on an unlucky texture it never saw standalone)
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def waveform_dir():
    path = "/root/reference/test_data/waveforms"
    if not os.path.isdir(path):
        pytest.skip("reference waveform fixtures unavailable")
    return path
