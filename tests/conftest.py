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


def _build_mini_sam(num_classes=3, image_size=64, seed=0, adapter_stages=(),
                    use_decoder_adapter=False):
    """A depth-reduced vit_t-shaped SAM for train-step tests.

    Same module graph as the production vit_t (4 TinyViT stages incl. the
    MBConv stage and 3 merges, prompt encoder, two-way mask decoder) at a
    fraction of the trace/compile cost — the train-step tests assert
    policy partitioning, mesh sharding, and loss behavior, none of which
    depend on the full-size widths/depths (slow-tier rebalance, VERDICT
    r3 weak #3). LoRA merges on this arch need
    ``heads_by_dim=MINI_HEADS_BY_DIM``.
    """
    from tee_optical_flow_tpu.models.registry import _init_variables
    from tee_optical_flow_tpu.models.sam import Sam
    from tee_optical_flow_tpu.models.tinyvit import TinyViT

    encoder = TinyViT(img_size=image_size, embed_dims=(16, 32, 40, 80),
                      depths=(1, 1, 2, 1), num_heads=(1, 2, 2, 2),
                      window_sizes=(4, 4, 4, 4), neck_dim=64,
                      adapter_stages=tuple(adapter_stages))
    model = Sam(image_encoder=encoder, num_classes=num_classes,
                image_size=image_size, embed_dim=64,
                use_decoder_adapter=use_decoder_adapter)
    return model, _init_variables(model, image_size, seed)


# fused-qkv head counts for the mini arch's transformer stages
MINI_HEADS_BY_DIM = {32: 2, 40: 2, 80: 2}


@pytest.fixture(scope="session")
def mini_sam_builder():
    """(builder, heads_by_dim) for the depth-reduced train-test arch."""
    return _build_mini_sam, MINI_HEADS_BY_DIM


@pytest.fixture(scope="session")
def waveform_dir():
    path = "/root/reference/test_data/waveforms"
    if not os.path.isdir(path):
        pytest.skip("reference waveform fixtures unavailable")
    return path
