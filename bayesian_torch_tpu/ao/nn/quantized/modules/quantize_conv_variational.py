"""Alias of the canonical implementation (reference keeps a legacy copy
under ao/nn/quantized/modules/quantize_conv_variational.py)."""

from bayesian_torch_tpu.layers.variational_layers.quantize_conv_variational import *  # noqa: F401,F403
from bayesian_torch_tpu.layers.variational_layers.quantize_conv_variational import __all__  # noqa: F401
