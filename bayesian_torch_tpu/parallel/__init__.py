from bayesian_torch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
from bayesian_torch_tpu.parallel.mc import (  # noqa: F401
    mc_forward,
    mc_vmap,
)
from bayesian_torch_tpu.parallel.tp import shard_params_tp  # noqa: F401
from bayesian_torch_tpu.parallel.distributed import initialize  # noqa: F401
