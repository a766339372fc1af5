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
