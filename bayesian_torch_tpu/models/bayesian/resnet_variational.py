"""Bayesian CIFAR ResNet-20..110 (reparameterization).

Counterpart of reference models/bayesian/resnet_variational.py
(factories :170-187).
"""

from bayesian_torch_tpu.models._cifar_resnet import (  # noqa: F401
    BasicBlock,
    CifarResNet,
    make_factories,
)

__all__ = ["resnet20", "resnet32", "resnet44", "resnet56", "resnet110"]

globals().update(make_factories("Reparameterization"))
