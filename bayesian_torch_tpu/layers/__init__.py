"""All Bayesian layer classes, re-exported flat (mirrors reference
bayesian_torch/layers/__init__.py so ``getattr(layers, name)`` lookups in
dnn_to_bnn keep working)."""

from bayesian_torch_tpu.layers.base_variational_layer import (  # noqa: F401
    BaseVariationalLayer,
    get_kernel_size,
)

# The reference spells the base class with a trailing underscore
# (bayesian_torch/layers/base_variational_layer.py:35 `class
# BaseVariationalLayer_`); keep that exact public name working for
# migrating code that subclasses or isinstance-checks it.
BaseVariationalLayer_ = BaseVariationalLayer
from bayesian_torch_tpu.layers.variational_layers import *  # noqa: F401,F403
from bayesian_torch_tpu.layers.flipout_layers import *  # noqa: F401,F403
from bayesian_torch_tpu.layers.batchnorm import (  # noqa: F401
    BatchNorm1dLayer,
    BatchNorm2dLayer,
    BatchNorm3dLayer,
    QuantizedBatchNorm2d,
)
from bayesian_torch_tpu.layers.dropout import Dropout  # noqa: F401
from bayesian_torch_tpu.layers.relu import ReLU  # noqa: F401
from bayesian_torch_tpu.layers.variational_layers.quantize_linear_variational import (  # noqa: F401
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
from bayesian_torch_tpu.layers.flipout_layers.quantized_linear_flipout import (  # noqa: F401
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
from bayesian_torch_tpu.layers.base_variational_layer import (  # noqa: F401
    make_rngs,
    seed_default_rngs,
)
# The reference's layer files pull the torch observer/QConfig names into
# bayesian_torch.layers (conv_flipout.py:40-41); mirror that surface so
# `from bayesian_torch.layers import QConfig`-style imports port 1:1.
from bayesian_torch_tpu.quantization.observers import (  # noqa: F401
    HistogramObserver,
    MinMaxObserver,
    PerChannelMinMaxObserver,
    QConfig,
)
