"""Multi-host initialization.

The reference's multi-node story is torch.distributed scaffolding
(dist.init_process_group + mp.spawn, main_bayesian_imagenet.py:255-294)
that never actually wraps the model. The TPU-native equivalent is
one call: ``jax.distributed.initialize`` — afterwards ``jax.devices()``
spans all hosts and every mesh built by ``parallel.make_mesh`` covers
the full slice (ICI intra-slice, DCN across slices) with zero trainer
changes; XLA's collectives replace NCCL.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (no-op on a single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters. Returns the global
    device count.
    """
    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / unsupported platform: fine
    return len(jax.devices())
