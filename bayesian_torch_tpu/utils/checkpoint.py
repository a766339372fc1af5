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

import jax.numpy as jnp
import orbax.checkpoint as ocp
from flax import nnx


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(str(path)))


def save_checkpoint(model: nnx.Module, path: str) -> None:
    """Save a model's Param + BatchStat state to ``path`` (a directory).

    Overwrites an existing checkpoint at ``path`` like the reference's
    ``torch.save`` (main_bayesian_cifar.py:303-313) — re-running a
    trainer must not crash on its own previous output.
    """
    state = nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abspath(path), nnx.to_pure_dict(state), force=True)


def save_training_checkpoint(path: str, model: nnx.Module,
                             optimizer=None, *, epoch: int = 0,
                             best_acc: float = 0.0) -> None:
    """Full training checkpoint: model Param+BatchStat, optimizer state,
    noise-RNG counters, epoch and best accuracy — the reference's
    --resume payload (main_bayesian_imagenet.py:316-336 restores
    epoch/best_acc/optimizer, main_bayesian_cifar.py:204-215).

    RNG *counts* are persisted (keys are reconstructed from the seeds
    the caller builds the model with), so a same-seed resume continues
    the exact noise-draw sequence.
    """
    payload = {
        "model": nnx.to_pure_dict(
            nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))),
        "rng_count": nnx.to_pure_dict(nnx.state(model, nnx.RngCount)),
        "meta": {"epoch": jnp.asarray(epoch, jnp.int32),
                 "best_acc": jnp.asarray(best_acc, jnp.float32)},
    }
    if optimizer is not None:
        payload["opt"] = nnx.to_pure_dict(nnx.state(optimizer))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abspath(path), payload, force=True)


def load_training_checkpoint(path: str, model: nnx.Module,
                             optimizer=None) -> dict:
    """Restore a ``save_training_checkpoint`` payload in place.

    Returns ``{"epoch": int, "best_acc": float}`` so trainers can
    continue from the next epoch (reference
    main_bayesian_imagenet.py:322-330).
    """
    target = {
        "model": nnx.to_pure_dict(
            nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))),
        "rng_count": nnx.to_pure_dict(nnx.state(model, nnx.RngCount)),
        "meta": {"epoch": jnp.asarray(0, jnp.int32),
                 "best_acc": jnp.asarray(0.0, jnp.float32)},
    }
    if optimizer is not None:
        target["opt"] = nnx.to_pure_dict(nnx.state(optimizer))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(_abspath(path), target=target)

    state = nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))
    nnx.replace_by_pure_dict(state, restored["model"])
    nnx.update(model, state)
    rng_state = nnx.state(model, nnx.RngCount)
    nnx.replace_by_pure_dict(rng_state, restored["rng_count"])
    nnx.update(model, rng_state)
    if optimizer is not None:
        opt_state = nnx.state(optimizer)
        nnx.replace_by_pure_dict(opt_state, restored["opt"])
        nnx.update(optimizer, opt_state)
    return {"epoch": int(restored["meta"]["epoch"]),
            "best_acc": float(restored["meta"]["best_acc"])}


def load_checkpoint(model: nnx.Module, path: str) -> None:
    """Restore Param + BatchStat state saved by ``save_checkpoint``
    into ``model`` in place."""
    state = nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(_abspath(path),
                                 target=nnx.to_pure_dict(state))
    nnx.replace_by_pure_dict(state, restored)
    nnx.update(model, state)


def _torch_key_for(path) -> str:
    """Render an nnx state path as a torch ``state_dict`` key.

    Our ``nn.Sequential`` stores children as ``_0``, ``_1``, ... — the
    torch key uses the bare index (``layer1.0.conv1.mu_kernel``)."""
    parts = []
    for p in path:
        p = str(p)
        if p.startswith("_") and p[1:].isdigit():
            p = p[1:]
        parts.append(p)
    return ".".join(parts)


def import_torch_state_dict(model: nnx.Module, state_dict, *,
                            strict: bool = True):
    """Load a reference (IntelLabs/bayesian-torch) torch ``state_dict``
    into an nnx model in place.

    This is the migration shim for users holding reference checkpoints
    (loaded in the reference at
    main_bayesian_imagenet_bnn2qbnn.py:279-283 and restored via
    ``load_state_dict`` in every example trainer). Weight layouts
    already match (torch-layout ``mu_kernel``/``mu_weight`` etc.), so
    the mapping is purely by name:

    - ``module.`` (DataParallel) prefixes are stripped;
    - a full checkpoint dict (``{'state_dict': ..., 'epoch': ...}``,
      the reference's --resume format, main_bayesian_cifar.py:204-215)
      is unwrapped automatically;
    - numeric path components index our ``nn.Sequential`` children;
    - prior buffers are absent from reference checkpoints (registered
      ``persistent=False``, linear_variational.py:90-98) and are NOT
      expected.

    ``state_dict`` may be a mapping name -> tensor/ndarray or a path to
    a ``torch.save`` file. Returns ``(missing_keys, unexpected_keys)``
    like torch's ``load_state_dict``; with ``strict=True`` (default)
    raises ``ValueError`` if either is non-empty or any shape mismatches.
    """
    import numpy as np

    if isinstance(state_dict, (str, os.PathLike)):
        import torch
        state_dict = torch.load(_abspath(str(state_dict)),
                                map_location="cpu", weights_only=False)
    if "state_dict" in state_dict and not hasattr(
            state_dict["state_dict"], "shape"):
        state_dict = state_dict["state_dict"]

    entries = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().numpy()
        entries[k] = np.asarray(v)

    state = nnx.state(model, nnx.Any(nnx.Param, nnx.BatchStat))
    flat = dict(nnx.to_flat_state(state))
    by_torch_key = {_torch_key_for(path): (path, var)
                    for path, var in flat.items()}

    missing = sorted(set(by_torch_key) - set(entries))
    unexpected = sorted(set(entries) - set(by_torch_key))
    errors = []
    for key in sorted(set(entries) & set(by_torch_key)):
        _, var = by_torch_key[key]
        val = entries[key]
        cur = var[...]
        if tuple(val.shape) != tuple(cur.shape):
            errors.append(f"{key}: shape {tuple(val.shape)} vs model "
                          f"{tuple(cur.shape)}")
            continue
        var.set_value(jnp.asarray(val, dtype=cur.dtype))
    nnx.update(model, state)

    if strict and (missing or unexpected or errors):
        raise ValueError(
            "import_torch_state_dict mismatch:\n"
            + (f"  missing keys: {missing}\n" if missing else "")
            + (f"  unexpected keys: {unexpected}\n" if unexpected else "")
            + (f"  shape errors: {errors}\n" if errors else ""))
    if errors:
        raise ValueError(f"shape errors: {errors}")
    return missing, unexpected
