"""dnn_to_bnn surgery, get_kl_loss, MOPED."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import bayesian_torch_tpu.nn as dnn
from bayesian_torch_tpu.layers import (Conv2dReparameterization,
                                       LinearFlipout,
                                       LinearReparameterization,
                                       LSTMReparameterization)
from bayesian_torch_tpu.models import dnn_to_bnn, get_kl_loss
from bayesian_torch_tpu.utils import get_rho

CONST_BNN_PRIOR_PARAMETERS = {
    "prior_mu": 0.0,
    "prior_sigma": 1.0,
    "posterior_mu_init": 0.0,
    "posterior_rho_init": -3.0,
    "type": "Reparameterization",
    "moped_enable": False,
    "moped_delta": 0.5,
}


class SmallNet(nnx.Module):
    def __init__(self, rngs):
        self.conv = dnn.Conv2d(3, 8, 3, padding=1, rngs=rngs)
        self.body = dnn.Sequential(
            dnn.Conv2d(8, 8, 3, padding=1, rngs=rngs),
            dnn.ReLU(),
        )
        self.fc = dnn.Linear(8 * 4 * 4, 10, rngs=rngs)

    def __call__(self, x):
        x = jax.nn.relu(self.conv(x))
        x = self.body(x)
        x = x.reshape(x.shape[0], -1)
        return self.fc(x)


def test_surgery_replaces_all_layers_in_place():
    net = SmallNet(nnx.Rngs(params=0, noise=1))
    dnn_to_bnn(net, CONST_BNN_PRIOR_PARAMETERS)
    assert isinstance(net.conv, Conv2dReparameterization)
    assert isinstance(net.fc, LinearReparameterization)
    assert isinstance(net.body[0], Conv2dReparameterization)  # nested
    # converted layers are in bare-output mode
    assert net.conv.dnn_to_bnn_flag
    out = net(jnp.ones((2, 3, 4, 4)))
    assert out.shape == (2, 10)  # forward returns bare logits


def test_surgery_flipout_type():
    net = SmallNet(nnx.Rngs(params=0, noise=1))
    params = dict(CONST_BNN_PRIOR_PARAMETERS, type="Flipout")
    dnn_to_bnn(net, params)
    assert type(net.fc).__name__ == "LinearFlipout"


def test_surgery_preserves_geometry():
    net = SmallNet(nnx.Rngs(params=0, noise=1))
    dnn_to_bnn(net, CONST_BNN_PRIOR_PARAMETERS)
    assert net.conv.in_channels == 3
    assert net.conv.out_channels == 8
    assert net.conv.kernel_size == (3, 3)
    assert net.conv.padding == 1
    assert net.fc.in_features == 128


def test_get_kl_loss_sums_layers():
    net = SmallNet(nnx.Rngs(params=0, noise=1))
    dnn_to_bnn(net, CONST_BNN_PRIOR_PARAMETERS)
    kl = get_kl_loss(net)
    expected = (float(net.conv.kl_loss()) + float(net.body[0].kl_loss())
                + float(net.fc.kl_loss()))
    assert float(kl) == pytest.approx(expected, rel=1e-6)


def test_get_kl_loss_counts_lstm_once():
    class Net(nnx.Module):
        def __init__(self):
            self.lstm = LSTMReparameterization(
                4, 6, rngs=nnx.Rngs(params=0, noise=1))

    net = Net()
    kl = get_kl_loss(net)
    expected = float(net.lstm.ih.kl_loss()) + float(net.lstm.hh.kl_loss())
    assert float(kl) == pytest.approx(expected, rel=1e-6)


def test_moped_init_through_surgery():
    net = SmallNet(nnx.Rngs(params=0, noise=1))
    det_weight = np.asarray(net.fc.weight[...]).copy()
    det_bias = np.asarray(net.fc.bias[...]).copy()
    params = dict(CONST_BNN_PRIOR_PARAMETERS, moped_enable=True,
                  moped_delta=0.2)
    dnn_to_bnn(net, params)
    np.testing.assert_allclose(np.asarray(net.fc.mu_weight[...]), det_weight)
    np.testing.assert_allclose(
        np.asarray(net.fc.rho_weight[...]),
        np.asarray(get_rho(jnp.asarray(det_weight), 0.2)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(net.fc.mu_bias[...]), det_bias)


def test_lstm_surgery():
    class Net(nnx.Module):
        def __init__(self, rngs):
            self.rnn = dnn.LSTM(5, 8, rngs=rngs)

    net = Net(nnx.Rngs(params=0, noise=1))
    dnn_to_bnn(net, CONST_BNN_PRIOR_PARAMETERS)
    assert isinstance(net.rnn, LSTMReparameterization)
    assert net.rnn.in_features == 5
    assert net.rnn.out_features == 8
    out, state = net.rnn(jnp.ones((2, 4, 5)))  # flag => no kl
    assert out.shape == (2, 4, 8)


def test_nnx_linear_and_conv_conversion():
    class FlaxNet(nnx.Module):
        def __init__(self, rngs):
            self.conv = nnx.Conv(3, 8, (3, 3), padding="SAME", rngs=rngs)
            self.fc = nnx.Linear(8, 10, rngs=rngs)

        def __call__(self, x):  # NHWC
            x = jax.nn.relu(self.conv(x))
            x = x.mean(axis=(1, 2))
            return self.fc(x)

    net = FlaxNet(nnx.Rngs(0))
    x = jnp.ones((2, 4, 4, 3))
    params = dict(CONST_BNN_PRIOR_PARAMETERS, moped_enable=True,
                  moped_delta=0.5)
    # capture det output for MOPED-mean comparison
    det_out = net(x)
    dnn_to_bnn(net, params)
    assert type(net.conv).__name__ == "Conv2dReparameterization"
    assert net.conv.data_format == "NHWC"
    assert type(net.fc).__name__ == "LinearReparameterization"
    out = net(x)
    assert out.shape == (2, 10)
    # with moped init, mean forward should be near det forward
    # (sigma = 0.5|w| noise makes individual draws vary; compare the
    # mu-only forward via eps injection)
    out_mu = net.conv(x, eps_k=jnp.zeros(net.conv.mu_kernel.shape),
                      eps_b=jnp.zeros(net.conv.mu_bias.shape))
    ref_conv = nnx.Conv(3, 8, (3, 3), padding="SAME", rngs=nnx.Rngs(0))
    np.testing.assert_allclose(np.asarray(out_mu),
                               np.asarray(jax.nn.relu(ref_conv(x)) * 0
                                          + ref_conv(x)), rtol=1e-4,
                               atol=1e-5)


def test_nnx_convtranspose_conversion_preserves_function():
    """nnx.ConvTranspose (SAME, stride 1) -> ConvTranspose2dReparam:
    geometry translated (symmetric crop -> torch padding), weights
    MOPED-copied with the layout/flip correction, mu-forward equal."""
    ct = nnx.ConvTranspose(3, 5, (3, 3), padding="SAME",
                           rngs=nnx.Rngs(0))

    class Net(nnx.Module):
        def __init__(self, ct):
            self.up = ct

        def __call__(self, x):
            return self.up(x)

    net = Net(ct)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3),
                    jnp.float32)
    det_out = np.asarray(net(x))
    params = dict(CONST_BNN_PRIOR_PARAMETERS, moped_enable=True,
                  moped_delta=0.5)
    dnn_to_bnn(net, params)
    assert type(net.up).__name__ == "ConvTranspose2dReparameterization"
    assert net.up.data_format == "NHWC"
    out_mu = net.up(x, eps_k=jnp.zeros(net.up.mu_kernel.shape),
                    eps_b=jnp.zeros(net.up.mu_bias.shape))
    assert out_mu.shape == det_out.shape  # SAME stride-1: (2, 4, 4, 5)
    np.testing.assert_allclose(np.asarray(out_mu), det_out, rtol=1e-4,
                               atol=1e-4)


def test_nnx_convtranspose_geometry_grid():
    """Every flax ConvTranspose SAME/VALID geometry — including the
    odd-crop (op=-1) and stride>kernel (op=s-ke) cases round 2 refused
    — converts to an exact function-preserving twin (the reference
    converts every name-matched layer unconditionally,
    dnn_to_bnn.py:127-154)."""
    for pad in ("SAME", "VALID"):
        for k, s, di in [(3, 2, 1), (2, 1, 1), (4, 3, 1), (2, 3, 1),
                         (3, 2, 2), (5, 2, 1)]:
            ct = nnx.ConvTranspose(3, 5, (k, k), strides=(s, s),
                                   kernel_dilation=(di, di), padding=pad,
                                   rngs=nnx.Rngs(0))

            class Net(nnx.Module):
                def __init__(self, ct):
                    self.up = ct

                def __call__(self, x):
                    return self.up(x)

            net = Net(ct)
            x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 6, 3),
                            jnp.float32)
            ref = np.asarray(net(x))
            dnn_to_bnn(net, dict(CONST_BNN_PRIOR_PARAMETERS,
                                 moped_enable=True, moped_delta=0.5))
            out = net.up(x, eps_k=jnp.zeros(net.up.mu_kernel.shape),
                         eps_b=jnp.zeros(net.up.mu_bias.shape))
            assert out.shape == ref.shape, (pad, k, s, di)
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                       atol=1e-4,
                                       err_msg=f"{pad} k{k} s{s} d{di}")


def test_nnx_convtranspose_valid_padding():
    ct = nnx.ConvTranspose(3, 4, (3, 3), padding="VALID", rngs=nnx.Rngs(1))

    class Net(nnx.Module):
        def __init__(self):
            self.up = ct

        def __call__(self, x):
            return self.up(x)

    net = Net()
    x = jnp.asarray(np.random.RandomState(1).randn(1, 5, 5, 3),
                    jnp.float32)
    det_out = np.asarray(net(x))
    dnn_to_bnn(net, dict(CONST_BNN_PRIOR_PARAMETERS, moped_enable=True,
                         moped_delta=0.5))
    out_mu = net.up(x, eps_k=jnp.zeros(net.up.mu_kernel.shape),
                    eps_b=jnp.zeros(net.up.mu_bias.shape))
    np.testing.assert_allclose(np.asarray(out_mu), det_out, rtol=1e-4,
                               atol=1e-4)


def test_nnx_rnn_lstm_conversion():
    """nnx.RNN over an LSTM cell becomes the full-sequence Bayesian
    LSTM (torch-style return contract); bare cells convert too."""

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.rnn = nnx.RNN(nnx.OptimizedLSTMCell(6, 12, rngs=rngs))
            self.head = nnx.Linear(12, 3, rngs=rngs)

        def __call__(self, x):
            seq = self.rnn(x)
            return self.head(seq[:, -1])

    net = Net(nnx.Rngs(0))
    dnn_to_bnn(net, dict(CONST_BNN_PRIOR_PARAMETERS))
    assert type(net.rnn).__name__ == "LSTMReparameterization"
    assert net.rnn.ih.in_features == 6
    assert net.rnn.ih.out_features == 48  # 4*hidden
    # converted module follows the torch LSTM contract: (seq, (h, c))
    x = jnp.ones((2, 7, 6))
    seq, (h, c) = net.rnn(x)
    assert seq.shape == (2, 7, 12)
    kl = get_kl_loss(net)
    assert float(kl) > 0

    class CellNet(nnx.Module):
        def __init__(self, rngs):
            self.cell = nnx.LSTMCell(4, 8, rngs=rngs)

        def __call__(self, x):
            return x

    cn = CellNet(nnx.Rngs(1))
    dnn_to_bnn(cn, dict(CONST_BNN_PRIOR_PARAMETERS, type="Flipout"))
    assert type(cn.cell).__name__ == "LSTMFlipout"
    assert cn.cell.hh.in_features == 8
