"""ao.nn.quantized.modules namespace: the reference's LEGACY quantized
layer snapshots (ao/nn/quantized/modules/*.py). Unlike the canonical
``bayesian_torch_tpu.layers`` classes these pin the legacy semantics:
default_scale=0.1, int8-quantized bias, no quant_dict calibrated path."""

from bayesian_torch_tpu.ao.nn.quantized.modules.quantize_linear_variational import *  # noqa: F401,F403,E501
from bayesian_torch_tpu.ao.nn.quantized.modules.quantize_conv_variational import *  # noqa: F401,F403,E501
from bayesian_torch_tpu.ao.nn.quantized.modules.quantized_linear_flipout import *  # noqa: F401,F403,E501
from bayesian_torch_tpu.ao.nn.quantized.modules.quantized_conv_flipout import *  # noqa: F401,F403,E501
