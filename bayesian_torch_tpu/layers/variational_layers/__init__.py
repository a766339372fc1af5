from bayesian_torch_tpu.layers.variational_layers.linear_variational import (  # noqa: F401
    LinearReparameterization,
)
