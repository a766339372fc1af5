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
