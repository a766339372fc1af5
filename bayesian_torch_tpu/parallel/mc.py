"""Monte-Carlo sample parallelism: vmapped MC axis, sharded over chips.

The reference runs MC sampling as a Python loop calling the model
``num_mc`` times (main_bayesian_mnist.py:27-32,
main_bayesian_cifar.py:501-503). TPU-native re-design: the MC axis is a
``vmap`` dimension over the model's noise-RNG state (params broadcast),
compiled once; on a ('mc','data') mesh XLA partitions the vmapped
computation across chips, so 10 MC samples of ResNet-50 run as one
program at roughly the cost structure of a 10x-larger batch. This is
the BASELINE.json north-star mechanism.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mc_vmap(num_mc: int):
    """Decorator: lift ``f(model, *args)`` over a leading MC axis.

    The model's 'noise' RNG stream is split ``num_mc`` ways (independent
    weight draws per sample); parameters and inputs broadcast.

        @mc_vmap(10)
        def forward(model, x):
            out, kl = model(x)
            return out, kl

        outs, kls = forward(model, x)   # outs: (10, B, ...)
    """
    state_axes = nnx.StateAxes({"noise": 0, ...: None})

    def decorator(f):
        import functools

        @functools.wraps(f)
        def wrapper(model, *args):
            vf = nnx.split_rngs(splits=num_mc, only="noise")(
                nnx.vmap(f, in_axes=(state_axes,) + (None,) * len(args),
                         out_axes=0))
            return vf(model, *args)

        return wrapper

    return decorator


def mc_forward(model: nnx.Module, x, num_mc: int, *,
               mesh: Optional[Mesh] = None, return_kl: bool = True,
               compute_kl: Optional[bool] = None):
    """Run ``num_mc`` stochastic forwards as one vmapped computation.

    Returns ``(outputs, kl)`` with outputs stacked on a leading MC axis
    (shape (num_mc, ...)). When ``mesh`` is given, the MC axis is
    sharding-constrained to the mesh's 'mc' axis and the batch dim to
    'data', so the samples are computed on different chips.

    Note the KL term is a function of parameters only, so it is the
    same scalar for every draw; it is returned unstacked. Pass
    ``return_kl=False`` (pure inference) to also skip evaluating the
    closed-form KL entirely; ``compute_kl`` overrides that linkage.
    """
    if compute_kl is None:
        compute_kl = return_kl
    kl_off = []
    if not compute_kl:
        for _, mod in nnx.iter_modules(model):
            if getattr(mod, "compute_kl", None) is True:
                mod.compute_kl = False
                kl_off.append(mod)
    try:
        return _mc_forward_inner(model, x, num_mc, mesh, return_kl)
    finally:
        for mod in kl_off:
            mod.compute_kl = True


def _mc_forward_inner(model, x, num_mc, mesh, return_kl):
    if num_mc == 1:
        # plain forward (exact reference semantics incl. BN stat updates)
        out = model(x)
        out, kl_single = out if isinstance(out, tuple) else (out, 0.0)
        outs = jax.tree.map(lambda o: o[None], out)
        kls = jnp.asarray(kl_single)[None] if hasattr(
            kl_single, "ndim") else jnp.asarray([kl_single])
    else:
        state_axes = nnx.StateAxes({"noise": 0, ...: None})

        @nnx.split_rngs(splits=num_mc, only="noise")
        @nnx.vmap(in_axes=(state_axes, None), out_axes=0)
        def _run(model, x):
            out = model(x)
            if isinstance(out, tuple):
                return out
            return out, 0.0

        # Freeze BN running-stat writes during the vmapped run: mutating
        # broadcast state under vmap is ill-defined. Batch statistics are
        # still used for normalization in training mode. (This is a
        # static trace-time toggle.)
        frozen = []
        for _, mod in nnx.iter_modules(model):
            if getattr(mod, "stats_frozen", None) is False:
                mod.stats_frozen = True
                frozen.append(mod)
        try:
            outs, kls = _run(model, x)
        finally:
            for mod in frozen:
                mod.stats_frozen = False
    if mesh is not None:
        outs = jax.lax.with_sharding_constraint(
            outs, NamedSharding(mesh, P("mc", "data")))
    if return_kl:
        kl = kls[0] if getattr(kls, "ndim", 0) > 0 else kls
        return outs, kl
    return outs
