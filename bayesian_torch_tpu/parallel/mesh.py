"""Device-mesh utilities for (data, mc) parallelism.

The reference's parallelism surface is torch DataParallel plus unused
torch.distributed scaffolding (SURVEY.md §2.5). The TPU-native design is
a single ``jax.sharding.Mesh`` whose axes carry batch data and Monte
Carlo samples; XLA collectives over ICI replace NCCL. Multi-host scaling
uses the same mesh spanning hosts (jax.distributed.initialize) with no
code changes here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mc: int = 1, data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('mc', 'data'[, 'model']) mesh over the devices.

    ``mc`` slots carry the Monte-Carlo sample axis, ``model`` slots
    carry tensor-parallel parameter shards (see parallel.tp), and the
    rest go to the data-batch axis (``data`` defaults to
    n_devices // (mc * model)). The 'model' axis is only included when
    model > 1, keeping the common 2-D case simple.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % (mc * model) != 0:
            raise ValueError(
                f"{n} devices not divisible by mc*model={mc * model}")
        data = n // (mc * model)
    if mc * data * model != n:
        raise ValueError(f"mesh {mc}x{data}x{model} != {n} devices")
    if model > 1:
        return Mesh(np.asarray(devices).reshape(mc, data, model),
                    ("mc", "data", "model"))
    return Mesh(np.asarray(devices).reshape(mc, data), ("mc", "data"))


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a host batch on the mesh, sharded along its leading dim."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
