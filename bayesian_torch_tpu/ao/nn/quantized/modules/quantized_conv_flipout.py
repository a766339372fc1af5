"""Alias of the canonical implementation (reference keeps a legacy copy
under ao/nn/quantized/modules/quantized_conv_flipout.py)."""

from bayesian_torch_tpu.layers.flipout_layers.quantized_conv_flipout import *  # noqa: F401,F403
from bayesian_torch_tpu.layers.flipout_layers.quantized_conv_flipout import __all__  # noqa: F401
