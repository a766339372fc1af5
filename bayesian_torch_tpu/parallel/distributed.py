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

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kwargs) -> int:
    """Initialize multi-host JAX (no-op on a single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters. Returns the global
    device count.

    When explicit arguments are given, initialization errors propagate
    (a mis-addressed coordinator must not be silent). Auto-detection
    failures on single-process setups are expected and logged at INFO.
    """
    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id, **kwargs)
    else:
        try:
            jax.distributed.initialize()
        except Exception as e:
            # single-process / unsupported platform: fine, but say so
            logger.info(
                "jax.distributed.initialize() auto-detection failed "
                "(%s: %s); continuing single-process",
                type(e).__name__, e)
    return len(jax.devices())
