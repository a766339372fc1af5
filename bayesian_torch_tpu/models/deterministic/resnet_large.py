"""Deterministic ImageNet ResNet-18..152 (MOPED sources / baselines).

Counterpart of reference models/deterministic/resnet_large.py (the
torchvision-style twin; model_urls pretrained loading is torch-specific
and replaced by load_checkpoint / MOPED warm starts).
"""

from bayesian_torch_tpu.models._large_resnet import (  # noqa: F401
    BasicBlock,
    Bottleneck,
    LargeResNet,
    make_factories,
)

__all__ = ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152"]

globals().update(make_factories(None))
