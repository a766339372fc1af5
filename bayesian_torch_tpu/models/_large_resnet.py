"""Shared ImageNet ResNet-18..152 implementation (det / reparam / flipout).

One parameterized implementation covers the reference's three copies:
models/bayesian/resnet_variational_large.py (BasicBlock :48, Bottleneck
:83, ResNet :150, factories :246-294), models/bayesian/
resnet_flipout_large.py, and models/deterministic/resnet_large.py.

torchvision-style ResNet: 7x7 s2 stem - BN - ReLU - maxpool 3x3 s2 -
4 stages - avgpool(7) - fc. Downsample paths in the Bayesian variants
are Sequential(Conv-Bayes, BatchNorm2dLayer) threading (x, kl) tuples
(reference resnet_variational_large.py:190-203). The reference's
``pretrained`` model_urls are torch-specific and not reproduced; use
MOPED / load_checkpoint for warm starts.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
from flax import nnx

import bayesian_torch_tpu.nn as dnn
from bayesian_torch_tpu.nn import functional as F
from bayesian_torch_tpu.layers.base_variational_layer import default_rngs
from bayesian_torch_tpu.layers.batchnorm import BatchNorm2dLayer

prior_mu = 0.0
prior_sigma = 1.0
posterior_mu_init = 0.0
posterior_rho_init = -3.0


def _layer_factories(estimator, rngs, data_format="NCHW"):
    if estimator is None:
        def conv(cin, cout, k, **kw):
            return dnn.Conv2d(cin, cout, k, bias=False, rngs=rngs,
                              data_format=data_format, **kw)

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
            return Conv(cin, cout, k, bias=False, rngs=rngs,
                        data_format=data_format, **bkw, **kw)

        def linear(cin, cout):
            return Lin(cin, cout, rngs=rngs, **bkw)
    return conv, linear


class _Block(nnx.Module):
    def _res(self, x):
        """Run downsample (tuple-threading) or identity on the residual."""
        if self.downsample is None:
            return x, 0.0
        out = self.downsample(x)
        if isinstance(out, tuple):
            return out
        return out, 0.0


class BasicBlock(_Block):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, *,
                 estimator, rngs, data_format="NCHW"):
        conv, _ = _layer_factories(estimator, rngs, data_format)
        self.estimator = estimator
        self.conv1 = conv(inplanes, planes, 3, stride=stride, padding=1)
        self.bn1 = dnn.BatchNorm2d(planes, data_format=data_format)
        self.conv2 = conv(planes, planes, 3, stride=1, padding=1)
        self.bn2 = dnn.BatchNorm2d(planes, data_format=data_format)
        self.downsample = downsample

    def __call__(self, x):
        if self.estimator is None:
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            residual, _ = self._res(x)
            return F.relu(out + residual)
        kl_sum = 0.0
        out, kl = self.conv1(x)
        kl_sum += kl
        out = F.relu(self.bn1(out))
        out, kl = self.conv2(out)
        kl_sum += kl
        out = self.bn2(out)
        residual, kl = self._res(x)
        kl_sum += kl
        return F.relu(out + residual), kl_sum


class Bottleneck(_Block):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, *,
                 estimator, rngs, data_format="NCHW"):
        conv, _ = _layer_factories(estimator, rngs, data_format)
        self.estimator = estimator
        self.conv1 = conv(inplanes, planes, 1)
        self.bn1 = dnn.BatchNorm2d(planes, data_format=data_format)
        self.conv2 = conv(planes, planes, 3, stride=stride, padding=1)
        self.bn2 = dnn.BatchNorm2d(planes, data_format=data_format)
        self.conv3 = conv(planes, planes * 4, 1)
        self.bn3 = dnn.BatchNorm2d(planes * 4, data_format=data_format)
        self.downsample = downsample

    def __call__(self, x):
        if self.estimator is None:
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            residual, _ = self._res(x)
            return F.relu(out + residual)
        kl_sum = 0.0
        out, kl = self.conv1(x)
        kl_sum += kl
        out = F.relu(self.bn1(out))
        out, kl = self.conv2(out)
        kl_sum += kl
        out = F.relu(self.bn2(out))
        out, kl = self.conv3(out)
        kl_sum += kl
        out = self.bn3(out)
        residual, kl = self._res(x)
        kl_sum += kl
        return F.relu(out + residual), kl_sum


class LargeResNet(nnx.Module):
    def __init__(self, block_cls, layers, num_classes=1000, *,
                 estimator=None, rngs: Optional[nnx.Rngs] = None,
                 data_format: str = "NCHW", remat_blocks: bool = False):
        if rngs is None:
            rngs = default_rngs()
        conv, linear = _layer_factories(estimator, rngs, data_format)
        self.estimator = estimator
        self.data_format = data_format
        self.remat_blocks = remat_blocks
        self._rngs_for_init = rngs

        self.inplanes = 64
        self.conv1 = conv(3, 64, 7, stride=2, padding=3)
        self.bn1 = dnn.BatchNorm2d(64, data_format=data_format)
        self.maxpool = dnn.MaxPool2d(3, stride=2, padding=1,
                                     data_format=data_format)
        self.layer1 = self._make_layer(block_cls, 64, layers[0], 1,
                                       estimator, rngs)
        self.layer2 = self._make_layer(block_cls, 128, layers[1], 2,
                                       estimator, rngs)
        self.layer3 = self._make_layer(block_cls, 256, layers[2], 2,
                                       estimator, rngs)
        self.layer4 = self._make_layer(block_cls, 512, layers[3], 2,
                                       estimator, rngs)
        self.avgpool = dnn.AdaptiveAvgPool2d(1, data_format=data_format)
        self.fc = linear(512 * block_cls.expansion, num_classes)

        if estimator is None:
            self._he_init(rngs)

    def _make_layer(self, block_cls, planes, blocks, stride, estimator,
                    rngs):
        df = self.data_format
        conv, _ = _layer_factories(estimator, rngs, df)
        downsample = None
        if stride != 1 or self.inplanes != planes * block_cls.expansion:
            # Bayesian downsample: Sequential(conv-bayes, BatchNorm2dLayer)
            # threading (x, kl) (resnet_variational_large.py:193-203)
            bn = (BatchNorm2dLayer(planes * block_cls.expansion,
                                   data_format=df)
                  if estimator is not None
                  else dnn.BatchNorm2d(planes * block_cls.expansion,
                                       data_format=df))
            downsample = dnn.Sequential(
                conv(self.inplanes, planes * block_cls.expansion, 1,
                     stride=stride),
                bn,
            )
        mods = [block_cls(self.inplanes, planes, stride, downsample,
                          estimator=estimator, rngs=rngs, data_format=df)]
        self.inplanes = planes * block_cls.expansion
        for _ in range(1, blocks):
            mods.append(block_cls(self.inplanes, planes,
                                  estimator=estimator, rngs=rngs,
                                  data_format=df))
        return dnn.Sequential(*mods)

    def _he_init(self, rngs):
        """Reference det init: conv N(0, sqrt(2/n)) with n = k*k*out_ch,
        BN weight=1 bias=0 (resnet_variational_large.py:181-188)."""
        for _, mod in nnx.iter_modules(self):
            if isinstance(mod, dnn.Conv2d):
                n = (mod.kernel_size[0] * mod.kernel_size[1]
                     * mod.out_channels)
                std = math.sqrt(2.0 / n)
                mod.weight[...] = std * jax.random.normal(
                    rngs.params(), mod.weight.shape, mod.weight[...].dtype)

    def train(self):
        for _, mod in nnx.iter_modules(self):
            if hasattr(mod, "training"):
                mod.training = True

    def eval(self):
        for _, mod in nnx.iter_modules(self):
            if hasattr(mod, "training"):
                mod.training = False

    def _block_call(self, block, x):
        """One residual block, optionally behind a remat boundary.

        ``remat_blocks=True`` checkpoints each block: only block INPUTS
        are saved for backward and the block recomputes its activations
        in the backward pass. At large batch x MC products the full
        activation set oversubscribes HBM and XLA falls back to its own
        ad-hoc rematerialization, which breaks the BN/ReLU/residual
        epilogue fusion that makes the inference step 95% conv work
        (profiled in benchmarks/profile_train.py); a structured
        per-block boundary keeps live memory at the block inputs and
        restores the fused forms."""
        mode = getattr(self, "remat_blocks", False)
        if not mode:
            return block(x)
        policy = None
        if mode == "conv_out":
            # save only the convs' results; recompute the cheap BN/ReLU
            # elementwise chains in backward (conv outputs are tagged
            # via jax.ad_checkpoint.checkpoint_name in ops/conv.py)
            policy = jax.checkpoint_policies.save_only_these_names(
                "conv_out")
        return nnx.remat(lambda m, h: m(h), policy=policy)(block, x)

    def __call__(self, x):
        if self.estimator is None:
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.maxpool(out)
            for layer in (self.layer1, self.layer2, self.layer3,
                          self.layer4):
                for block in layer:
                    out = self._block_call(block, out)
            out = self.avgpool(out)
            out = out.reshape(out.shape[0], -1)
            return self.fc(out)

        kl_sum = 0.0
        out, kl = self.conv1(x)
        kl_sum += kl
        out = F.relu(self.bn1(out))
        out = self.maxpool(out)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            for block in layer:
                out, kl = self._block_call(block, out)
                kl_sum += kl
        out = self.avgpool(out)
        out = out.reshape(out.shape[0], -1)
        out, kl = self.fc(out)
        kl_sum += kl
        return out, kl_sum


_DEPTHS = {
    "resnet18": (BasicBlock, [2, 2, 2, 2]),
    "resnet34": (BasicBlock, [3, 4, 6, 3]),
    "resnet50": (Bottleneck, [3, 4, 6, 3]),
    "resnet101": (Bottleneck, [3, 4, 23, 3]),
    "resnet152": (Bottleneck, [3, 8, 36, 3]),
}


def make_factories(estimator):
    def make(name, block_cls, layers):
        def factory(pretrained=False, num_classes=1000, *, rngs=None,
                    **kwargs):
            if pretrained:
                raise NotImplementedError(
                    "torch model-zoo URLs are not applicable; warm-start "
                    "via MOPED or load_checkpoint instead")
            return LargeResNet(block_cls, layers, num_classes,
                               estimator=estimator, rngs=rngs, **kwargs)
        factory.__name__ = name
        return factory

    return {name: make(name, b, l) for name, (b, l) in _DEPTHS.items()}
