"""Shared CIFAR ResNet-20..110 implementation (det / reparam / flipout).

One parameterized implementation covers the reference's three copies:
models/bayesian/resnet_variational.py (BasicBlock :41, ResNet :107,
factories :170-187), models/bayesian/resnet_flipout.py, and
models/deterministic/resnet.py.

Architecture (CIFAR ResNet, He et al. option-A shortcut): conv3x3(3->16)
- BN - ReLU - 3 stages of n BasicBlocks (16/32/64 planes, stride 2 at
stage entry) - global avg-pool - linear(64->classes). Shortcut option A
subsamples spatially by [::2] and zero-pads channels by planes//4 on
each side (resnet_variational.py:75-78). Bayesian blocks return
(out, kl); the deterministic variant returns bare outputs.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

import bayesian_torch_tpu.nn as dnn
from bayesian_torch_tpu.layers.base_variational_layer import default_rngs
from bayesian_torch_tpu.nn import functional as F

prior_mu = 0.0
prior_sigma = 1.0
posterior_mu_init = 0.0
posterior_rho_init = -3.0


def _layer_factories(estimator, rngs):
    if estimator is None:
        def conv(cin, cout, k, **kw):
            return dnn.Conv2d(cin, cout, k, bias=False, rngs=rngs, **kw)

        def linear(cin, cout):
            return dnn.Linear(cin, cout, rngs=rngs)
    else:
        import bayesian_torch_tpu.layers as bl
        Conv = getattr(bl, "Conv2d" + estimator)
        Lin = getattr(bl, "Linear" + estimator)
        bkw = dict(prior_mean=prior_mu, prior_variance=prior_sigma,
                   posterior_mu_init=posterior_mu_init,
                   posterior_rho_init=posterior_rho_init)

        def conv(cin, cout, k, **kw):
            return Conv(cin, cout, k, bias=False, rngs=rngs, **bkw, **kw)

        def linear(cin, cout):
            return Lin(cin, cout, rngs=rngs, **bkw)
    return conv, linear


def _option_a_shortcut(x, planes):
    """Zero-pad option-A shortcut (resnet_variational.py:75-78).

    QTensor inputs (INT8 quantize_activations flow) stay in the
    quantized domain: real 0 is the zero-point value, so channel
    padding pads ``q`` with ``zp`` and keeps (scale, zp)."""
    pad = planes // 4
    if isinstance(x, F.QTensor):
        q = x.q[:, :, ::2, ::2]
        q = jnp.pad(q, ((0, 0), (pad, pad), (0, 0), (0, 0)),
                    constant_values=jnp.uint8(x.zp))
        return F.QTensor(q, x.scale, x.zp)
    x = x[:, :, ::2, ::2]
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))


class BasicBlock(nnx.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1, *, estimator, rngs):
        conv, _ = _layer_factories(estimator, rngs)
        self.estimator = estimator
        self.planes = planes
        self.needs_shortcut = stride != 1 or in_planes != planes
        self.conv1 = conv(in_planes, planes, 3, stride=stride, padding=1)
        self.bn1 = dnn.BatchNorm2d(planes)
        self.conv2 = conv(planes, planes, 3, stride=1, padding=1)
        self.bn2 = dnn.BatchNorm2d(planes)

    def __call__(self, x):
        if self.estimator is None:
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            sc = _option_a_shortcut(x, self.planes) if self.needs_shortcut \
                else x
            return F.relu(out + sc)
        kl_sum = 0.0
        out, kl = self.conv1(x)
        kl_sum += kl
        out = F.relu(self.bn1(out))
        out, kl = self.conv2(out)
        kl_sum += kl
        out = self.bn2(out)
        sc = _option_a_shortcut(x, self.planes) if self.needs_shortcut else x
        return F.relu(out + sc), kl_sum


class CifarResNet(nnx.Module):
    def __init__(self, num_blocks, num_classes=10, *, estimator=None,
                 rngs: Optional[nnx.Rngs] = None):
        if rngs is None:
            rngs = default_rngs()
        conv, linear = _layer_factories(estimator, rngs)
        self.estimator = estimator

        self.in_planes = 16
        self.conv1 = conv(3, 16, 3, stride=1, padding=1)
        self.bn1 = dnn.BatchNorm2d(16)
        self.layer1 = self._make_layer(16, num_blocks[0], 1, estimator, rngs)
        self.layer2 = self._make_layer(32, num_blocks[1], 2, estimator, rngs)
        self.layer3 = self._make_layer(64, num_blocks[2], 2, estimator, rngs)
        self.linear = linear(64, num_classes)

        if estimator is None:
            self._kaiming_init(rngs)

    def _make_layer(self, planes, n, stride, estimator, rngs):
        strides = [stride] + [1] * (n - 1)
        blocks = []
        for s in strides:
            blocks.append(BasicBlock(self.in_planes, planes, s,
                                     estimator=estimator, rngs=rngs))
            self.in_planes = planes * BasicBlock.expansion
        return dnn.Sequential(*blocks)

    def _kaiming_init(self, rngs):
        """kaiming_normal on conv/linear weights, mirroring the reference's
        _weights_init (resnet_variational.py:27-29, effective only in the
        deterministic twin)."""
        for _, mod in nnx.iter_modules(self):
            if isinstance(mod, (dnn.Conv2d, dnn.Linear)):
                w = mod.weight[...]
                fan_in = int(w.size // w.shape[0])
                std = math.sqrt(2.0 / fan_in)
                mod.weight[...] = std * jax.random.normal(
                    rngs.params(), w.shape, w.dtype)

    def train(self):
        for _, mod in nnx.iter_modules(self):
            if isinstance(mod, dnn.BatchNorm2d):
                mod.train()

    def eval(self):
        for _, mod in nnx.iter_modules(self):
            if isinstance(mod, dnn.BatchNorm2d):
                mod.eval()

    def __call__(self, x):
        if self.estimator is None:
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.layer1(out)
            out = self.layer2(out)
            out = self.layer3(out)
            out = F.avg_pool_nd(out, out.shape[3])
            out = out.reshape(out.shape[0], -1)
            return self.linear(out)

        kl_sum = 0.0
        out, kl = self.conv1(x)
        kl_sum += kl
        out = F.relu(self.bn1(out))
        for layer in (self.layer1, self.layer2, self.layer3):
            for block in layer:
                out, kl = block(out)
                kl_sum += kl
        out = F.avg_pool_nd(out, out.shape[3])
        out = out.reshape(out.shape[0], -1)
        out, kl = self.linear(out)
        kl_sum += kl
        return out, kl_sum


def make_factories(estimator):
    """resnet20..resnet110 factory functions for a given estimator."""
    depths = {"resnet20": [3, 3, 3], "resnet32": [5, 5, 5],
              "resnet44": [7, 7, 7], "resnet56": [9, 9, 9],
              "resnet110": [18, 18, 18]}

    def make(name, blocks):
        def factory(num_classes=10, *, rngs=None):
            return CifarResNet(blocks, num_classes, estimator=estimator,
                               rngs=rngs)
        factory.__name__ = name
        return factory

    return {name: make(name, blocks) for name, blocks in depths.items()}
