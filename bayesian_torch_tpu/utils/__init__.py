from bayesian_torch_tpu.utils.util import (  # noqa: F401
    MOPED,
    entropy,
    get_rho,
    mutual_information,
    predictive_entropy,
)
