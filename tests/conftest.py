"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests simulate a TPU slice via
``--xla_force_host_platform_device_count`` (the TPU-native analog of
"test multi-node without a cluster", SURVEY.md §4).

TPU lane: ``BTT_TPU_TESTS=1 python -m pytest tests/ -m tpu`` keeps the
real TPU backend and runs only the hardware-marked tests (Pallas
distribution/moment checks and kernel-vs-XLA equivalence — interpret
mode stubs the HW PRNG to constant bits, so these cannot run on CPU).
"""

import os
import sys

TPU_LANE = os.environ.get("BTT_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("BTT_SYNTH_TRAIN_N", "512")
os.environ.setdefault("BTT_SYNTH_TEST_N", "256")

import jax  # noqa: E402

if TPU_LANE:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
else:
    # The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """tpu-marked tests require the real chip: skip them on the CPU
    mesh, and skip everything else in the TPU lane (one backend per
    pytest process — jax is already initialized)."""
    skip_tpu = pytest.mark.skip(
        reason="needs real TPU (run: BTT_TPU_TESTS=1 pytest -m tpu)")
    skip_cpu = pytest.mark.skip(reason="CPU-mesh test; TPU lane active")
    for item in items:
        is_tpu = item.get_closest_marker("tpu") is not None
        if is_tpu and not TPU_LANE:
            item.add_marker(skip_tpu)
        elif TPU_LANE and not is_tpu:
            item.add_marker(skip_cpu)


@pytest.fixture(autouse=True)
def _deterministic_default_rngs():
    from bayesian_torch_tpu.layers.base_variational_layer import seed_default_rngs
    seed_default_rngs(0)
    yield
