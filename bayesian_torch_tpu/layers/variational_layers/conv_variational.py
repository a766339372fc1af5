"""Conv / ConvTranspose layers with the reparameterization estimator.

TPU-native counterparts of reference
bayesian_torch/layers/variational_layers/conv_variational.py
(Conv1d :64, Conv2d :230, Conv3d :405, ConvTranspose1d :577,
ConvTranspose2d :747, ConvTranspose3d :922). All six share
``_BaseConvLayer``; see that module for layout/parity notes.
"""

from bayesian_torch_tpu.layers.conv_base import _BaseConvLayer

__all__ = [
    "Conv1dReparameterization",
    "Conv2dReparameterization",
    "Conv3dReparameterization",
    "ConvTranspose1dReparameterization",
    "ConvTranspose2dReparameterization",
    "ConvTranspose3dReparameterization",
]


class Conv1dReparameterization(_BaseConvLayer):
    nd = 1
    transposed = False
    estimator = "reparameterization"


class Conv2dReparameterization(_BaseConvLayer):
    nd = 2
    transposed = False
    estimator = "reparameterization"


class Conv3dReparameterization(_BaseConvLayer):
    nd = 3
    transposed = False
    estimator = "reparameterization"


class ConvTranspose1dReparameterization(_BaseConvLayer):
    nd = 1
    transposed = True
    estimator = "reparameterization"


class ConvTranspose2dReparameterization(_BaseConvLayer):
    nd = 2
    transposed = True
    estimator = "reparameterization"


class ConvTranspose3dReparameterization(_BaseConvLayer):
    nd = 3
    transposed = True
    estimator = "reparameterization"
