"""Tensor-parallel parameter sharding.

The reference has no tensor parallelism (SURVEY.md §2.5: "optional —
shard mu/rho along out-features in pjit param specs"); this implements
exactly that TPU-native option: posterior parameters (and deterministic
weights) are placed with a NamedSharding that splits the out-feature
dimension across a mesh axis, and XLA GSPMD propagates the sharding
through the sampled-weight elementwise ops into column-parallel
GEMMs/convs, inserting the collectives.

Because weight NOISE is drawn elementwise from mu/rho, the draw inherits
the same sharding — each shard samples only its slice, so TP also
divides the sampling cost.
"""

from __future__ import annotations

from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import jax


def _out_dim_spec(shape, axis_name, axis_size):
    """P(axis, None, ...) when the leading (out-feature) dim divides."""
    if len(shape) >= 1 and shape[0] % axis_size == 0 and shape[0] >= axis_size:
        return P(axis_name, *([None] * (len(shape) - 1)))
    return P(*([None] * len(shape)))


def shard_params_tp(model: nnx.Module, mesh: Mesh,
                    axis: str = "model") -> int:
    """Place every layer parameter with an out-feature-sharded
    NamedSharding over ``mesh[axis]``. Returns the number of parameter
    tensors sharded (others are replicated).

    Works on Bayesian layers (mu_*/rho_*), deterministic nn layers
    (weight/bias), and leaves everything else replicated.
    """
    axis_size = mesh.shape[axis]
    sharded = 0
    replicated = NamedSharding(mesh, P())
    for path, var in nnx.iter_graph(model):
        if not isinstance(var, nnx.Variable):
            continue
        val = var[...]
        if not hasattr(val, "shape") or val.ndim == 0:
            var.set_value(jax.device_put(val, replicated))
            continue
        name = path[-1] if path else ""
        if str(name).startswith(("mu_", "rho_", "weight", "bias")):
            spec = _out_dim_spec(val.shape, axis, axis_size)
            var.set_value(jax.device_put(
                val, NamedSharding(mesh, spec)))
            if spec != P(*([None] * val.ndim)):
                sharded += 1
        else:
            var.set_value(jax.device_put(val, replicated))
    return sharded
