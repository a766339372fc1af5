"""Frozen-draw serving mode for quantized models
(quantization.serving): opt-in hoisting of the per-step quantized
weight build — the measured INT8 bottleneck (benchmarks/
int8_analysis.py). Reference semantics (redraw every forward) stay the
default and are restored by unfreeze."""

import jax.numpy as jnp
import numpy as np

import bayesian_torch_tpu.layers as L
from bayesian_torch_tpu.layers import LinearReparameterization, make_rngs
from bayesian_torch_tpu.models.bnn_to_qbnn import _copy_layer_state
from bayesian_torch_tpu.quantization import (
    freeze_quantized_draws,
    unfreeze_quantized_draws,
)


def _qlinear():
    fl = LinearReparameterization(16, 8, rngs=make_rngs(0, noise_seed=1))
    ql = L.QuantizedLinearReparameterization(16, 8)
    _copy_layer_state(ql, fl)
    ql.quantize()
    return ql


def test_freeze_determinism_and_unfreeze():
    ql = _qlinear()
    x = jnp.asarray(np.random.RandomState(0).randn(3, 16), jnp.float32)
    a1, _ = ql(x)
    a2, _ = ql(x)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))  # redraws

    assert freeze_quantized_draws(ql) == 1
    b1, _ = ql(x)
    b2, _ = ql(x)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    # a frozen draw is a REAL posterior sample: magnitudes match the
    # unfrozen outputs' scale
    assert np.abs(np.asarray(b1)).max() < 10 * np.abs(np.asarray(a1)).max()

    assert unfreeze_quantized_draws(ql) == 1
    c1, _ = ql(x)
    c2, _ = ql(x)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))


def test_refreeze_redraws():
    ql = _qlinear()
    x = jnp.ones((2, 16), jnp.float32)
    freeze_quantized_draws(ql)
    a, _ = ql(x)
    freeze_quantized_draws(ql)  # new draw
    b, _ = ql(x)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_freeze_qresnet_smoke():
    from bayesian_torch_tpu.models.bayesian.quantized_resnet_variational_large import (  # noqa: E501
        qresnet18,
    )
    m = qresnet18(rngs=make_rngs(0, noise_seed=1), fuse_conv_bn=True,
                  data_format="NHWC")
    n = freeze_quantized_draws(m)
    assert n >= 20  # every quantized conv/linear froze
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3),
                    jnp.float32)
    o1, _ = m(x)
    o2, _ = m(x)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    unfreeze_quantized_draws(m)
    o3, _ = m(x)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
