from bayesian_torch_tpu.layers.variational_layers.linear_variational import (  # noqa: F401
    LinearReparameterization,
)
from bayesian_torch_tpu.layers.variational_layers.rnn_variational import (  # noqa: F401
    LSTMReparameterization,
)
from bayesian_torch_tpu.layers.variational_layers.conv_variational import (  # noqa: F401
    Conv1dReparameterization,
    Conv2dReparameterization,
    Conv3dReparameterization,
    ConvTranspose1dReparameterization,
    ConvTranspose2dReparameterization,
    ConvTranspose3dReparameterization,
)
# the reference star-imports its quantized modules here
# (bayesian_torch/layers/variational_layers/__init__.py:4-5), so these
# names are importable from this subpackage too
from bayesian_torch_tpu.layers.base_variational_layer import (  # noqa: F401
    BaseVariationalLayer as BaseVariationalLayer_,
)
from bayesian_torch_tpu.layers.variational_layers.quantize_linear_variational import (  # noqa: F401,E501
    QuantizedLinearReparameterization,
)
from bayesian_torch_tpu.layers.variational_layers.quantize_conv_variational import (  # noqa: F401,E501
    QuantizedConv1dReparameterization,
    QuantizedConv2dReparameterization,
    QuantizedConv3dReparameterization,
    QuantizedConvTranspose1dReparameterization,
    QuantizedConvTranspose2dReparameterization,
    QuantizedConvTranspose3dReparameterization,
)
# ... and its quantized layer files leak the torch observer/QConfig
# names into this namespace (quantize_linear_variational.py:48-50);
# mirror that surface with our observer equivalents
from bayesian_torch_tpu.quantization.observers import (  # noqa: F401
    HistogramObserver,
    MinMaxObserver,
    PerChannelMinMaxObserver,
    QConfig,
)
