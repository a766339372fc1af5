"""Block-remat training equivalence.

``LargeResNet(remat_blocks=True)`` wraps every residual block in an
``nnx.remat`` boundary so the MC train step saves only block inputs and
recomputes activations in backward (built for the MC=4/bs=128 flagship
train step, where the full activation set oversubscribes HBM — see
benchmarks/profile_train.py). Remat must be a pure scheduling change:
loss, gradients, and BN running-stat updates identical to the
non-remat model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from bayesian_torch_tpu.models._large_resnet import BasicBlock, LargeResNet
from bayesian_torch_tpu.parallel import mc_forward


def _build(remat, estimator):
    return LargeResNet(
        BasicBlock, [1, 1, 1, 1], num_classes=4, estimator=estimator,
        rngs=nnx.Rngs(params=jax.random.key(0), noise=jax.random.key(1)),
        data_format="NHWC", remat_blocks=remat)


def _train_quantities(remat, estimator="Reparameterization"):
    model = _build(remat, estimator)
    model.train()
    x = jax.random.normal(jax.random.key(7), (2, 16, 16, 3))
    y = jnp.array([1, 3])

    def loss_fn(model):
        outs, kl = mc_forward(model, x, 2)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            outs.mean(0), y).mean()
        return ce + kl / 2

    loss, grads = nnx.value_and_grad(loss_fn)(model)
    return (loss, jax.tree.leaves(nnx.to_flat_state(grads)),
            model.bn1.running_mean[...],
            model.layer2[0].bn1.running_mean[...])


def test_remat_blocks_match_no_remat_bayes():
    l0, g0, bm0, bs0 = _train_quantities(False)
    l1, g1, bm1, bs1 = _train_quantities(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bm0), np.asarray(bm1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(bs0), np.asarray(bs1), rtol=1e-5,
                               atol=1e-6)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_remat_blocks_match_no_remat_det():
    def det_loss(remat):
        model = _build(remat, None)
        model.train()
        x = jax.random.normal(jax.random.key(9), (2, 16, 16, 3))
        y = jnp.array([0, 2])

        def loss_fn(model):
            out = model(x)
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        return loss, jax.tree.leaves(nnx.to_flat_state(grads))

    l0, g0 = det_loss(False)
    l1, g1 = det_loss(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
