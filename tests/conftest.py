"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests simulate a TPU slice via
``--xla_force_host_platform_device_count`` (the TPU-native analog of
"test multi-node without a cluster", SURVEY.md §4).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("BTT_SYNTH_TRAIN_N", "512")
os.environ.setdefault("BTT_SYNTH_TEST_N", "256")

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _deterministic_default_rngs():
    from bayesian_torch_tpu.layers.base_variational_layer import seed_default_rngs
    seed_default_rngs(0)
    yield
