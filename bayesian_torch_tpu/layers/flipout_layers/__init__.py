from bayesian_torch_tpu.layers.flipout_layers.linear_flipout import (  # noqa: F401
    LinearFlipout,
)
from bayesian_torch_tpu.layers.flipout_layers.rnn_flipout import (  # noqa: F401
    LSTMFlipout,
)
from bayesian_torch_tpu.layers.flipout_layers.conv_flipout import (  # noqa: F401
    Conv1dFlipout,
    Conv2dFlipout,
    Conv3dFlipout,
    ConvTranspose1dFlipout,
    ConvTranspose2dFlipout,
    ConvTranspose3dFlipout,
)
# the reference star-imports its quantized modules here
# (bayesian_torch/layers/flipout_layers/__init__.py:4-5), so these
# names are importable from this subpackage too
from bayesian_torch_tpu.layers.base_variational_layer import (  # noqa: F401
    BaseVariationalLayer as BaseVariationalLayer_,
)
from bayesian_torch_tpu.layers.flipout_layers.quantized_linear_flipout import (  # noqa: F401,E501
    QuantizedLinearFlipout,
)
from bayesian_torch_tpu.layers.flipout_layers.quantized_conv_flipout import (  # noqa: F401
    QuantizedConv1dFlipout,
    QuantizedConv2dFlipout,
    QuantizedConv3dFlipout,
    QuantizedConvTranspose1dFlipout,
    QuantizedConvTranspose2dFlipout,
    QuantizedConvTranspose3dFlipout,
)
