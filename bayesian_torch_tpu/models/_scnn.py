"""Shared SCNN (LeNet-style MNIST CNN) implementation.

One parameterized module covers the reference's three copies:
models/bayesian/simple_cnn_variational.py:16-78 (reparam),
models/flipout/simple_cnn.py:16-74 (flipout),
models/deterministic/simple_cnn.py:8-30 (deterministic).

Architecture: Conv(1->32,k3) - ReLU - Conv(32->64,k3) - ReLU -
MaxPool(2) - Dropout2d(0.25) - Flatten - Linear(9216->128) - ReLU -
Dropout2d(0.5) - Linear(128->10) - log_softmax. Bayesian variants thread
kl_sum and return (log_probs, kl).
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import nnx

import bayesian_torch_tpu.nn as dnn
from bayesian_torch_tpu.layers.base_variational_layer import default_rngs
from bayesian_torch_tpu.nn import functional as F

prior_mu = 0.0
prior_sigma = 1.0
posterior_mu_init = 0.0
posterior_rho_init = -3.0


class _SCNN(nnx.Module):
    estimator: Optional[str] = None  # None => deterministic

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        if rngs is None:
            rngs = default_rngs()
        est = self.estimator
        if est is None:
            Conv = dnn.Conv2d
            Lin = dnn.Linear
            bkw = {}
        else:
            import bayesian_torch_tpu.layers as bl
            Conv = getattr(bl, "Conv2d" + est)
            Lin = getattr(bl, "Linear" + est)
            bkw = dict(prior_mean=prior_mu, prior_variance=prior_sigma,
                       posterior_mu_init=posterior_mu_init,
                       posterior_rho_init=posterior_rho_init)

        self.conv1 = Conv(1, 32, 3, stride=1, rngs=rngs, **bkw)
        self.conv2 = Conv(32, 64, 3, stride=1, rngs=rngs, **bkw)
        self.dropout1 = dnn.Dropout2d(0.25, rngs=rngs)
        self.dropout2 = dnn.Dropout2d(0.5, rngs=rngs)
        self.fc1 = Lin(9216, 128, rngs=rngs, **bkw)
        self.fc2 = Lin(128, 10, rngs=rngs, **bkw)

    def train(self):
        self.dropout1.train()
        self.dropout2.train()

    def eval(self):
        self.dropout1.eval()
        self.dropout2.eval()

    def _maybe(self, out, kl_sum):
        if isinstance(out, tuple):
            x, kl = out
            return x, kl_sum + kl
        return out, kl_sum

    def __call__(self, x):
        kl_sum = 0.0
        x, kl_sum = self._maybe(self.conv1(x), kl_sum)
        x = F.relu(x)
        x, kl_sum = self._maybe(self.conv2(x), kl_sum)
        x = F.relu(x)
        x = F.max_pool_nd(x, 2)
        x = self.dropout1(x)
        x = x.reshape(x.shape[0], -1)
        x, kl_sum = self._maybe(self.fc1(x), kl_sum)
        x = F.relu(x)
        x = self.dropout2(x)
        x, kl_sum = self._maybe(self.fc2(x), kl_sum)
        output = jax.nn.log_softmax(x, axis=1)
        if self.estimator is None:
            return output
        return output, kl_sum
