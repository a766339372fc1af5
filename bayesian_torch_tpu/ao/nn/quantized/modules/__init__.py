"""ao.nn.quantized.modules namespace (reference keeps older duplicate
copies of the quantized layers here, ao/nn/quantized/modules/*.py; this
framework has a single canonical implementation, re-exported)."""

from bayesian_torch_tpu.ao.nn.quantized.modules.quantize_linear_variational import *  # noqa: F401,F403,E501
from bayesian_torch_tpu.ao.nn.quantized.modules.quantize_conv_variational import *  # noqa: F401,F403,E501
from bayesian_torch_tpu.ao.nn.quantized.modules.quantized_linear_flipout import *  # noqa: F401,F403,E501
from bayesian_torch_tpu.ao.nn.quantized.modules.quantized_conv_flipout import *  # noqa: F401,F403,E501
