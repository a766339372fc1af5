"""Quantized transposed-conv path (zero-point correction must stay
border-exact through the fractionally-strided conv)."""

import jax.numpy as jnp
import numpy as np
from flax import nnx

import bayesian_torch_tpu.layers as L
from bayesian_torch_tpu.models.bnn_to_qbnn import qbnn_conv_layer


def test_quantized_conv_transpose_fidelity():
    conv = L.ConvTranspose2dReparameterization(
        6, 4, 3, stride=2, padding=1, output_padding=1,
        posterior_rho_init=-10.0, rngs=nnx.Rngs(params=0, noise=1))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 7, 7)
                    .astype(np.float32))
    float_out = conv(x, eps_k=jnp.zeros(conv.mu_kernel.shape),
                     eps_b=jnp.zeros(4))[0]

    conv.prepare()
    conv(x)  # calibration
    qconv = qbnn_conv_layer(conv)
    out, kl = qconv(x)
    assert kl == 0
    assert out.shape == float_out.shape == (2, 4, 14, 14)
    err = np.abs(np.asarray(out) - np.asarray(float_out))
    # within accumulated int8 quantization error
    assert err.mean() < 0.1, err.mean()
    corr = float(jnp.corrcoef(out.ravel(), float_out.ravel())[0, 1])
    assert corr > 0.99
