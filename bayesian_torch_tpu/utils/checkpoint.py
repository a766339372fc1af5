"""Checkpoint save/load for nnx models (orbax-backed).

Counterpart of the reference's ``torch.save(state_dict)`` /
``load_state_dict`` idiom (main_bayesian_cifar.py:303-313,
main_bayesian_imagenet.py:316-336). As in the reference, only the
posterior/affine parameters and batch stats are persisted; priors are
non-persistent and reconstructed from config (linear_variational.py:90-98)
unless MOPED replaced them, in which case re-run MOPED after loading.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp
from flax import nnx


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(str(path)))


def save_checkpoint(model: nnx.Module, path: str) -> None:
    """Save a model's Param + BatchStat state to ``path`` (a directory)."""
    state = nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abspath(path), nnx.to_pure_dict(state))


def load_checkpoint(model: nnx.Module, path: str) -> None:
    """Restore Param + BatchStat state saved by ``save_checkpoint``
    into ``model`` in place."""
    state = nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(_abspath(path),
                                 target=nnx.to_pure_dict(state))
    nnx.replace_by_pure_dict(state, restored)
    nnx.update(model, state)
