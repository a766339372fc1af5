"""Post-training INT8 quantization API.

Counterpart of reference bayesian_torch/ao/quantization/quantize.py:
``prepare(model)`` inserts calibration observers into every Bayesian
layer (the reference's enable_prepare per-layer ``.prepare()`` walk,
:135-151), the user runs calibration batches through the prepared
model, and ``convert(model)`` swaps in the INT8 quantized twins
(:169-172 -> bnn_to_qbnn).

The reference additionally rebuilds the model inside a torch-specific
``QuantizableResNet`` wrapper (QuantStub/FloatFunctional scaffolding,
:49-131) because torch's quantization API requires module markers; XLA
needs no such wrappers — observers on the Bayesian layers carry all the
calibration state — so prepare() here works on ANY nnx model, not just
ResNets.
"""

from __future__ import annotations

from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import (
    BaseVariationalLayer,
)
from bayesian_torch_tpu.models.bnn_to_qbnn import bnn_to_qbnn


def enable_prepare(m: nnx.Module, qconfig=None) -> None:
    """Walk the module graph calling each Bayesian layer's .prepare()
    (reference ao/quantization/quantize.py:135-151). ``qconfig`` is an
    optional observers.QConfig selecting the calibration observers."""
    for _, mod in nnx.iter_modules(m):
        if isinstance(mod, BaseVariationalLayer) and hasattr(mod, "prepare") \
                and not getattr(mod, "quant_prepare", False):
            mod.prepare(qconfig)


def prepare(model: nnx.Module, qconfig=None) -> nnx.Module:
    """Insert calibration observers; returns the (same, mutated) model.

    After prepare(), run representative batches through the model to
    record activation ranges, then call convert(). Pass a
    ``quantization.QConfig`` (e.g. ``QConfig(activation=
    HistogramObserver.with_args(dtype='quint8'), weight=
    MinMaxObserver.with_args(dtype='qint8'))``) to choose observers;
    default matches the reference's per-tensor MinMax stubs.
    """
    enable_prepare(model, qconfig)
    return model


def convert(model: nnx.Module, *, fuse_conv_bn: bool = False,
            quantize_activations: bool = False) -> nnx.Module:
    """Swap Bayesian layers for INT8 quantized twins using the
    calibration stats recorded since prepare().

    ``quantize_activations=True`` keeps activations uint8 between conv
    layers (QTensor flow) — several times less HBM traffic than fp32
    round trips; model-level relu/add/maxpool run in the quantized
    domain (exact when scales match, see ops/qtensor.py)."""
    bnn_to_qbnn(model, fuse_conv_bn=fuse_conv_bn,
                quantize_activations=quantize_activations)
    return model
