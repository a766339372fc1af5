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


def _qflipout(calibrated=False):
    from bayesian_torch_tpu.layers import LinearFlipout

    fl = LinearFlipout(16, 8, posterior_rho_init=-1.0,
                       rngs=make_rngs(0, noise_seed=1))
    if calibrated:
        from bayesian_torch_tpu.models.bnn_to_qbnn import qbnn_linear_layer

        fl.prepare()
        fl(jnp.asarray(np.random.RandomState(7).randn(32, 16),
                       jnp.float32))
        return qbnn_linear_layer(fl)
    ql = L.QuantizedLinearFlipout(16, 8)
    _copy_layer_state(ql, fl)
    ql.quantize()
    return ql


def test_freeze_flipout_pins_delta_signs_stay_per_call():
    """Flipout freeze pins the delta-kernel draw but the Rademacher
    signs remain per-call, so repeated outputs still differ — yet the
    delta component is frozen (re-freezing pins a different draw).
    Uses the calibrated quant_dict path: in the uncalibrated path the
    reference's own delta scale rule (s_sigma*normal_scale) clips the
    perturbation to ~1/40 of its float value and it rounds away at the
    default 0.2 output grid (PARITY.md)."""
    ql = _qflipout(calibrated=True)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 16), jnp.float32)
    a1, _ = ql(x)
    a2, _ = ql(x)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))  # redraws

    assert freeze_quantized_draws(ql) == 1
    assert ql._frozen_w is not None
    b1, _ = ql(x)
    b2, _ = ql(x)
    # signs are per-call: outputs vary even when frozen
    assert not np.allclose(np.asarray(b1), np.asarray(b2))

    frozen = np.asarray(ql._frozen_w[...])
    assert frozen.dtype == np.int8 and np.any(frozen != 0)

    # re-freezing pins a different delta draw
    freeze_quantized_draws(ql)
    frozen2 = np.asarray(ql._frozen_w[...])
    assert not np.array_equal(frozen, frozen2)

    assert unfreeze_quantized_draws(ql) == 1
    assert getattr(ql, "_frozen_w", None) is None
    c1, _ = ql(x)
    assert c1.shape == b1.shape


def test_freeze_covers_both_estimators():
    from flax import nnx

    qr = _qlinear()
    qf = _qflipout()

    class Pair(nnx.Module):
        def __init__(self):
            self.a = qr
            self.b = qf

    m = Pair()
    assert freeze_quantized_draws(m) == 2
    assert unfreeze_quantized_draws(m) == 2


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
