"""Serving-mode utilities for quantized Bayesian models.

The reference redraws the quantized sampled weights on EVERY forward
(quantize_linear_variational.py:172-189), and the default path here
keeps that semantic. At deployable batch sizes the per-step weight
build (eps draw + quantize + qmul/qadd per layer) dominates the INT8
step — the convs themselves are ~2x faster than bf16 on the MXU
(benchmarks/int8_analysis.py). ``freeze_quantized_draws`` hoists one
weight draw out of the step for serving: each quantized layer samples
once and reuses the drawn int8 weights until ``unfreeze`` (or the next
``freeze``) — e.g. redraw every K requests to retain MC diversity
across batches while amortizing the build.

Flipout layers freeze their DELTA-kernel draw (sigma*eps) the same
way; the Rademacher sign flips stay per-call — that is flipout's
decorrelation semantic, and the signs are activation-shaped (cheap)
while the delta build is weight-shaped (the cost being amortized).

This is an explicit opt-in DEVIATION from reference per-forward-redraw
semantics (frozen draws make repeated reparam calls deterministic;
frozen flipout calls still vary through the signs).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import Presampled
from bayesian_torch_tpu.layers.quantized_base import _QuantizedLayerBase

__all__ = ["freeze_quantized_draws", "unfreeze_quantized_draws"]

_ATTRS = ("_frozen_w", "_frozen_wscale", "_frozen_bias")


def freeze_quantized_draws(model: nnx.Module, *,
                           normal_scale: float = 6 / 255) -> int:
    """Draw and pin one quantized weight sample per quantized layer.
    Returns the number of layers frozen. Reparam layers pin the full
    sampled weight; flipout layers pin the delta kernel (signs stay
    per-call)."""
    n = 0
    for _, mod in nnx.iter_modules(model):
        if not isinstance(mod, _QuantizedLayerBase):
            continue
        if mod.estimator == "flipout":
            w_q, w_scale, bias = mod._sampled_qdelta_flipout(normal_scale)
        else:
            w_q, w_scale, bias = mod._sampled_qweight_reparam(normal_scale)
        mod._frozen_w = Presampled(w_q)
        mod._frozen_wscale = Presampled(jnp.asarray(w_scale))
        mod._frozen_bias = Presampled(bias) if bias is not None else None
        n += 1
    return n


def unfreeze_quantized_draws(model: nnx.Module) -> int:
    """Restore per-forward redrawing (reference semantics)."""
    n = 0
    for _, mod in nnx.iter_modules(model):
        if isinstance(mod, _QuantizedLayerBase) \
                and getattr(mod, "_frozen_w", None) is not None:
            for a in _ATTRS:
                if hasattr(mod, a):
                    delattr(mod, a)
            n += 1
    return n
