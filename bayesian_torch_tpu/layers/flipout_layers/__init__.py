from bayesian_torch_tpu.layers.flipout_layers.linear_flipout import (  # noqa: F401
    LinearFlipout,
)
