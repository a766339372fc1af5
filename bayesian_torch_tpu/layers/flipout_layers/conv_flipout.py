"""Conv / ConvTranspose layers with the Flipout estimator.

TPU-native counterparts of reference
bayesian_torch/layers/flipout_layers/conv_flipout.py
(Conv1d :57, Conv2d :247, Conv3d :443, ConvTranspose1d :640,
ConvTranspose2d :834, ConvTranspose3d :1033). All six share
``_BaseConvLayer``.
"""

from bayesian_torch_tpu.layers.conv_base import _BaseConvLayer

__all__ = [
    "Conv1dFlipout",
    "Conv2dFlipout",
    "Conv3dFlipout",
    "ConvTranspose1dFlipout",
    "ConvTranspose2dFlipout",
    "ConvTranspose3dFlipout",
]


class Conv1dFlipout(_BaseConvLayer):
    nd = 1
    transposed = False
    estimator = "flipout"


class Conv2dFlipout(_BaseConvLayer):
    nd = 2
    transposed = False
    estimator = "flipout"


class Conv3dFlipout(_BaseConvLayer):
    nd = 3
    transposed = False
    estimator = "flipout"


class ConvTranspose1dFlipout(_BaseConvLayer):
    nd = 1
    transposed = True
    estimator = "flipout"


class ConvTranspose2dFlipout(_BaseConvLayer):
    nd = 2
    transposed = True
    estimator = "flipout"


class ConvTranspose3dFlipout(_BaseConvLayer):
    nd = 3
    transposed = True
    estimator = "flipout"
