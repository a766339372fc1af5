from bayesian_torch_tpu.utils.util import (  # noqa: F401
    MOPED,
    entropy,
    freeze_batchnorm,
    get_rho,
    mutual_information,
    predictive_entropy,
)
