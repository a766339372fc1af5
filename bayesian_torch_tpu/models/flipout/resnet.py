"""CIFAR ResNet-20..110 (flipout) under the models.flipout namespace.

Counterpart of reference models/flipout/resnet.py.
"""

from bayesian_torch_tpu.models.bayesian.resnet_flipout import *  # noqa: F401,F403
from bayesian_torch_tpu.models.bayesian.resnet_flipout import __all__  # noqa: F401
