"""vmap-native BatchNorm EMA inside mc_forward (bn_stats="ema").

Replaces the round-1 engine's extra gradient-free refresh forward:
running stats are now updated from the mean of per-draw batch
statistics collected inside the MC vmap (VERDICT weak-item 6).
"""

import jax.numpy as jnp
import numpy as np
from flax import nnx

from bayesian_torch_tpu.layers import (BatchNorm2dLayer,
                                       Conv2dReparameterization)
from bayesian_torch_tpu.parallel import mc_forward


class ConvBN(nnx.Module):
    def __init__(self, rho=-6.0, *, rngs):
        self.conv = Conv2dReparameterization(
            3, 8, 3, padding=1, posterior_rho_init=rho, rngs=rngs)
        self.bn = BatchNorm2dLayer(8)

    def __call__(self, x):
        out, kl = self.conv(x)
        out, _ = self.bn((out, 0))
        return out, kl


def _x(seed=0, n=4):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 3, 6, 6)).astype(np.float32))


def test_mc_ema_updates_running_stats():
    m = ConvBN(rngs=nnx.Rngs(params=0, noise=1))
    x = _x()
    rm0 = np.asarray(m.bn.running_mean[...]).copy()
    outs, kl = mc_forward(m, x, num_mc=4)
    assert outs.shape[0] == 4
    assert int(m.bn.num_batches_tracked[...]) == 1
    assert np.any(np.asarray(m.bn.running_mean[...]) != rm0)
    # accumulator cleaned up
    assert getattr(m.bn, "_mc_stats", None) is None


def test_mc_ema_zero_sigma_matches_plain_forward():
    """With sigma ~ 0 all draws are identical, so the averaged per-draw
    stats equal a single plain forward's batch stats — the running
    stats must match a plain (non-vmapped) forward's EMA update."""
    m1 = ConvBN(rho=-25.0, rngs=nnx.Rngs(params=0, noise=1))
    m2 = ConvBN(rho=-25.0, rngs=nnx.Rngs(params=0, noise=2))
    x = _x()
    mc_forward(m1, x, num_mc=3)
    m2(x)  # plain forward updates stats in-layer
    np.testing.assert_allclose(np.asarray(m1.bn.running_mean[...]),
                               np.asarray(m2.bn.running_mean[...]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.bn.running_var[...]),
                               np.asarray(m2.bn.running_var[...]),
                               rtol=1e-5, atol=1e-6)
    assert int(m1.bn.num_batches_tracked[...]) == 1


def test_mc_ema_freeze_mode_leaves_stats():
    m = ConvBN(rngs=nnx.Rngs(params=0, noise=1))
    rm0 = np.asarray(m.bn.running_mean[...]).copy()
    mc_forward(m, _x(), num_mc=4, bn_stats="freeze")
    np.testing.assert_array_equal(np.asarray(m.bn.running_mean[...]), rm0)
    assert int(m.bn.num_batches_tracked[...]) == 0


def test_mc_ema_eval_mode_no_update():
    m = ConvBN(rngs=nnx.Rngs(params=0, noise=1))
    m.bn.eval()
    rm0 = np.asarray(m.bn.running_mean[...]).copy()
    mc_forward(m, _x(), num_mc=4)
    np.testing.assert_array_equal(np.asarray(m.bn.running_mean[...]), rm0)


def test_mc_ema_under_jit_and_grad():
    """The train-step path: nnx.jit + value_and_grad over a loss that
    calls mc_forward must still propagate the running-stat writes."""
    import optax

    m = ConvBN(rngs=nnx.Rngs(params=0, noise=1))
    opt = nnx.Optimizer(m, optax.sgd(0.01), wrt=nnx.Param)
    x = _x()

    @nnx.jit
    def step(m, opt, x):
        def loss_fn(m):
            outs, kl = mc_forward(m, x, num_mc=3)
            return jnp.mean(outs ** 2) + 0.0 * kl

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        opt.update(m, grads)
        return loss

    rm0 = np.asarray(m.bn.running_mean[...]).copy()
    step(m, opt, x)
    assert int(m.bn.num_batches_tracked[...]) == 1
    assert np.any(np.asarray(m.bn.running_mean[...]) != rm0)
    step(m, opt, x)
    assert int(m.bn.num_batches_tracked[...]) == 2


def test_freeze_batchnorm_helper():
    """utils.freeze_batchnorm: BN normalizes by running stats and stops
    updating them, while the rest of the model keeps training."""
    import numpy as np
    from bayesian_torch_tpu.layers import (BatchNorm2dLayer,
                                           Conv2dReparameterization)
    from bayesian_torch_tpu.utils import freeze_batchnorm

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv = Conv2dReparameterization(
                3, 4, 3, padding=1, data_format="NHWC", rngs=rngs)
            self.bn = BatchNorm2dLayer(4, data_format="NHWC", rngs=rngs)

        def __call__(self, x):
            h, kl = self.conv(x)
            return self.bn(h), kl

    net = Net(nnx.Rngs(params=0, noise=1))
    # sigma -> 0 so the conv is deterministic and the hand-computed
    # normalization below sees the same activations
    net.conv.rho_kernel[...] = net.conv.rho_kernel[...] * 0 - 30
    net.conv.rho_bias[...] = net.conv.rho_bias[...] * 0 - 30
    net.train()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 5, 5, 3),
                    jnp.float32)
    net(x)  # warm the running stats once
    rm = np.asarray(net.bn.running_mean[...]).copy()
    nbt = int(net.bn.num_batches_tracked[...])

    n = freeze_batchnorm(net)
    assert n == 1
    assert net.bn.training is False

    out, _ = net(x + 1.0)
    # stats untouched by the frozen forward
    np.testing.assert_array_equal(
        np.asarray(net.bn.running_mean[...]), rm)
    assert int(net.bn.num_batches_tracked[...]) == nbt
    # normalization used the running stats, not this batch's stats
    h, _ = net.conv(x + 1.0)
    inv = 1.0 / np.sqrt(np.asarray(net.bn.running_var[...]) + net.bn.eps)
    expected = (np.asarray(h) - rm) * inv \
        * np.asarray(net.bn.weight[...]) + np.asarray(net.bn.bias[...])
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=2e-5, atol=2e-5)
