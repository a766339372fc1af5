from bayesian_torch_tpu.models.dnn_to_bnn import (  # noqa: F401
    dnn_to_bnn,
    get_kl_loss,
)
from bayesian_torch_tpu.models.bnn_to_qbnn import (  # noqa: F401
    batch_norm_folding,
    bnn_to_qbnn,
)
