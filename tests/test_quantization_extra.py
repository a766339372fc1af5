"""Quantization coverage: LSTM quantization, NHWC (flax-origin) chain."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import bayesian_torch_tpu.layers as L
from bayesian_torch_tpu.models import dnn_to_bnn
from bayesian_torch_tpu.models.bnn_to_qbnn import bnn_to_qbnn


def test_quantized_lstm_via_bnn_to_qbnn():
    """The reference's QuantizedLSTM lookup would raise; ours quantizes
    the cell's ih/hh linear blocks in place."""

    class Net(nnx.Module):
        def __init__(self):
            self.rnn = L.LSTMReparameterization(
                4, 6, posterior_rho_init=-8.0,
                rngs=nnx.Rngs(params=0, noise=1))

        def __call__(self, x):
            return self.rnn(x)

    net = Net()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4)
                    .astype(np.float32))
    # calibrate the linear blocks
    net.rnn.ih.prepare()
    net.rnn.hh.prepare()
    net.rnn.ih(jnp.asarray(np.random.RandomState(1).randn(8, 4),
                           jnp.float32))
    net.rnn.hh(jnp.asarray(np.random.RandomState(2).randn(8, 6),
                           jnp.float32))
    bnn_to_qbnn(net)
    assert type(net.rnn.ih).__name__ == "QuantizedLinearReparameterization"
    assert type(net.rnn.hh).__name__ == "QuantizedLinearReparameterization"
    out, state, kl = net.rnn(x)
    assert out.shape == (2, 5, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_nhwc_flax_model_full_ptq_chain():
    """flax nnx.Conv model -> dnn_to_bnn (NHWC Bayesian convs) ->
    prepare/calibrate/convert -> int8 forward."""
    from bayesian_torch_tpu.quantization import convert, prepare

    class FlaxNet(nnx.Module):
        def __init__(self, rngs):
            self.conv = nnx.Conv(3, 8, (3, 3), padding="SAME", rngs=rngs)
            self.fc = nnx.Linear(8, 10, rngs=rngs)

        def __call__(self, x):  # NHWC
            x = jax.nn.relu(self.conv(x))
            x = x.mean(axis=(1, 2))
            return self.fc(x)

    net = FlaxNet(nnx.Rngs(0))
    dnn_to_bnn(net, {
        "prior_mu": 0.0, "prior_sigma": 1.0, "posterior_mu_init": 0.0,
        "posterior_rho_init": -8.0, "type": "Reparameterization",
        # small delta: sigma = 1% of |w|, so the float and int8 draws
        # are near-deterministic and the correlation isolates
        # quantization error rather than sampling noise
        "moped_enable": True, "moped_delta": 0.01,
    })
    assert net.conv.data_format == "NHWC"
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 3)
                    .astype(np.float32))
    float_out = net(x)
    prepare(net)
    net(x)
    convert(net)
    assert type(net.conv).__name__ == "QuantizedConv2dReparameterization"
    q_out = net(x)
    assert q_out.shape == (4, 10)
    corr = float(jnp.corrcoef(jnp.asarray(float_out).ravel(),
                              jnp.asarray(q_out).ravel())[0, 1])
    assert corr > 0.95, corr


def test_qtensor_int8_residual_add_differing_scales():
    """QTensor.add_q: uint8 add + requant for DIFFERING operand scales
    (the reference's add_relu FloatFunctional semantics,
    ao/quantization/quantize.py:49-131) matches the exact fp32 add to
    within one output quantum; the INT8_RESIDUAL_ADD flag reroutes
    __add__ onto it."""
    import numpy as np

    from bayesian_torch_tpu.ops import qtensor as qt
    from bayesian_torch_tpu.ops.int8 import quantize_uint8
    from bayesian_torch_tpu.ops.qtensor import QTensor

    rs = np.random.RandomState(0)
    a_f = rs.uniform(-3, 3, (4, 8, 8, 16)).astype(np.float32)
    b_f = rs.uniform(-6, 6, (4, 8, 8, 16)).astype(np.float32)
    a = QTensor(quantize_uint8(jnp.asarray(a_f), 3 / 127.5, 128),
                3 / 127.5, 128)
    b = QTensor(quantize_uint8(jnp.asarray(b_f), 6 / 127.5, 128),
                6 / 127.5, 128)

    out = a.add_q(b)
    assert out.q.dtype == jnp.uint8
    assert out.scale == a.scale + b.scale
    exact = a.dequantize() + b.dequantize()
    np.testing.assert_allclose(np.asarray(out.dequantize()),
                               np.asarray(exact), atol=out.scale * 1.01)
    # relu stays uint8 on the result
    r = out.relu()
    np.testing.assert_allclose(
        np.asarray(r.dequantize()),
        np.maximum(np.asarray(out.dequantize()), 0.0),
        atol=out.scale * 0.51)

    # default __add__ falls back to fp32 (strictly more accurate);
    # the flag flips it into the uint8 path
    assert not isinstance(a + b, QTensor)
    qt.INT8_RESIDUAL_ADD = True
    try:
        s = a + b
        assert isinstance(s, QTensor)
        np.testing.assert_array_equal(np.asarray(s.q),
                                      np.asarray(out.q))
    finally:
        qt.INT8_RESIDUAL_ADD = False
