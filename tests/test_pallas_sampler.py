"""Pallas fused weight sampler (K1): plumbing and gradient structure.

Interpret mode (CPU) stubs the hardware PRNG to constant bits, so
distribution quality is validated on real TPU hardware separately
(moments mean~0/std~1/kurt~3 verified on v5e; see
ops/pallas/sampled_weights.py). Here we test shapes, determinism
structure, custom-VJP math, and the mc_forward presample path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bayesian_torch_tpu.ops.pallas.sampled_weights import (
    sample_gaussian_pallas,
    sample_gaussian_pallas_batch,
)


def test_single_draw_shape_dtype_and_math():
    key = jax.random.key(0)
    mu = jax.random.normal(jax.random.key(1), (100, 37)) * 0.2
    rho = jnp.full((100, 37), -2.0)
    w = sample_gaussian_pallas(key, mu, rho, jnp.float32)
    assert w.shape == mu.shape
    # W = mu + softplus(rho) * eps for a consistent eps
    eps = (np.asarray(w) - np.asarray(mu)) / np.log1p(np.exp(-2.0))
    # whatever eps the PRNG produced, the affine relation must hold
    w2 = np.asarray(mu) + np.log1p(np.exp(-2.0)) * eps
    np.testing.assert_allclose(np.asarray(w), w2, rtol=1e-5)


def test_single_draw_grads():
    key = jax.random.key(0)
    mu = jax.random.normal(jax.random.key(1), (64, 64)) * 0.1
    rho = jnp.full((64, 64), -1.5)

    def loss(mu, rho):
        return (sample_gaussian_pallas(key, mu, rho, jnp.float32) ** 2).sum()

    w = sample_gaussian_pallas(key, mu, rho, jnp.float32)
    eps = (np.asarray(w) - np.asarray(mu)) / np.log1p(np.exp(-1.5))
    g_mu, g_rho = jax.grad(loss, argnums=(0, 1))(mu, rho)
    np.testing.assert_allclose(np.asarray(g_mu), 2 * np.asarray(w),
                               rtol=1e-4)
    expected = 2 * np.asarray(w) * eps / (1 + np.exp(1.5))
    np.testing.assert_allclose(np.asarray(g_rho), expected, rtol=1e-3,
                               atol=1e-5)


def test_batch_draw_shapes_and_grads():
    key = jax.random.key(3)
    mu = jnp.zeros((1000,))
    rho = jnp.zeros((1000,))
    S = 4
    w = sample_gaussian_pallas_batch(key, mu, rho, S, jnp.float32)
    assert w.shape == (S, 1000)

    def loss(mu, rho):
        return (sample_gaussian_pallas_batch(key, mu, rho, S,
                                             jnp.float32) ** 2).sum()

    w_np = np.asarray(w)
    eps = w_np / np.log(2.0)
    g_mu, g_rho = jax.grad(loss, argnums=(0, 1))(mu, rho)
    np.testing.assert_allclose(np.asarray(g_mu), 2 * w_np.sum(0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_rho),
                               (2 * w_np * eps).sum(0) * 0.5,
                               rtol=1e-3, atol=1e-3)


def test_mc_forward_presample_path():
    from bayesian_torch_tpu.layers import (Conv2dFlipout,
                                           LinearReparameterization)
    from bayesian_torch_tpu.parallel import mc_forward

    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(params=0, noise=1)
            self.conv = Conv2dFlipout(3, 8, 3, padding=1, rngs=r)
            self.fc = LinearReparameterization(8 * 4 * 4, 10, rngs=r)

        def __call__(self, x):
            h, k1 = self.conv(x)
            h = h.reshape(h.shape[0], -1)
            o, k2 = self.fc(h)
            return o, k1 + k2

    net = Net()
    x = jnp.ones((2, 3, 4, 4))
    outs, kl = mc_forward(net, x, 3, presample="on")
    assert outs.shape == (3, 2, 10)
    assert float(kl) > 0
    # transient state cleaned up
    assert getattr(net.fc, "_presampled_w", None) is None
    assert getattr(net.conv, "_presampled_w", None) is None


def test_mc_forward_presample_xla_path():
    """presample='xla' (optimization_barrier mode): same semantics as
    the in-vmap draw — fresh per-call draws, per-layer streams — and
    grads flow through the barrier into mu/rho."""
    from bayesian_torch_tpu.layers import (Conv2dFlipout,
                                           LinearReparameterization)
    from bayesian_torch_tpu.parallel import mc_forward

    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(params=0, noise=jax.random.key(1, impl="rbg"))
            self.conv = Conv2dFlipout(3, 8, 3, padding=1, rngs=r)
            self.fc = LinearReparameterization(8 * 4 * 4, 10, rngs=r)

        def __call__(self, x):
            h, k1 = self.conv(x)
            h = h.reshape(h.shape[0], -1)
            o, k2 = self.fc(h)
            return o, k1 + k2

    net = Net()
    x = jax.random.normal(jax.random.key(2), (2, 3, 4, 4))
    outs, kl = mc_forward(net, x, 3, presample="xla")
    assert outs.shape == (3, 2, 10)
    assert float(kl) > 0
    # transient state cleaned up even on the xla path
    assert getattr(net.fc, "_presampled_w", None) is None
    assert getattr(net.conv, "_presampled_w", None) is None
    # fresh draws each call
    outs2 = mc_forward(net, x, 3, presample="xla", return_kl=False)
    assert float(jnp.abs(outs - outs2).max()) > 1e-6
    # draws actually vary across the MC axis
    assert float(jnp.abs(outs[0] - outs[1]).max()) > 1e-6

    # sigma->0: xla mode equals the default in-vmap path exactly
    for mod in (net.conv, net.fc):
        for attr in ("rho_kernel", "rho_weight", "rho_bias"):
            if getattr(mod, attr, None) is not None:
                getattr(mod, attr)[...] = \
                    getattr(mod, attr)[...] * 0 - 30
    o_xla = mc_forward(net, x, 3, presample="xla", return_kl=False)
    o_ref = mc_forward(net, x, 3, return_kl=False)
    np.testing.assert_allclose(np.asarray(o_xla), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-6)

    # grads flow through the optimization_barrier
    def loss(model):
        o, k = mc_forward(model, x, 3, presample="xla")
        return (o ** 2).mean() + 0.0 * k

    g = nnx.grad(loss)(net)
    gm = dict(nnx.to_flat_state(g))
    nonzero = sum(
        float(jnp.abs(v[...]).max()) > 0 for v in gm.values()
        if hasattr(v, "__getitem__"))
    assert nonzero >= 2
