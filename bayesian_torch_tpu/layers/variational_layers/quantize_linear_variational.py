"""INT8 quantized Linear (reparameterization).

Counterpart of reference
layers/variational_layers/quantize_linear_variational.py:44-224; see
layers/quantized_base.py for the shared int8 machinery.
"""

from bayesian_torch_tpu.layers.quantized_base import _QuantizedLinearBase

__all__ = ["QuantizedLinearReparameterization"]


class QuantizedLinearReparameterization(_QuantizedLinearBase):
    estimator = "reparameterization"
