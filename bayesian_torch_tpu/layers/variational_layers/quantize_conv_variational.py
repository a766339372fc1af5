"""INT8 quantized Conv / ConvTranspose (reparameterization).

Counterpart of reference
layers/variational_layers/quantize_conv_variational.py (6 classes,
1492 LoC); see layers/quantized_base.py.
"""

from bayesian_torch_tpu.layers.quantized_base import _QuantizedConvBase

__all__ = [
    "QuantizedConv1dReparameterization",
    "QuantizedConv2dReparameterization",
    "QuantizedConv3dReparameterization",
    "QuantizedConvTranspose1dReparameterization",
    "QuantizedConvTranspose2dReparameterization",
    "QuantizedConvTranspose3dReparameterization",
]


class QuantizedConv1dReparameterization(_QuantizedConvBase):
    estimator = "reparameterization"
    nd = 1


class QuantizedConv2dReparameterization(_QuantizedConvBase):
    estimator = "reparameterization"
    nd = 2


class QuantizedConv3dReparameterization(_QuantizedConvBase):
    estimator = "reparameterization"
    nd = 3


class QuantizedConvTranspose1dReparameterization(_QuantizedConvBase):
    estimator = "reparameterization"
    nd = 1
    transposed = True


class QuantizedConvTranspose2dReparameterization(_QuantizedConvBase):
    estimator = "reparameterization"
    nd = 2
    transposed = True


class QuantizedConvTranspose3dReparameterization(_QuantizedConvBase):
    estimator = "reparameterization"
    nd = 3
    transposed = True
