from bayesian_torch_tpu.models.dnn_to_bnn import (  # noqa: F401
    dnn_to_bnn,
    get_kl_loss,
)
