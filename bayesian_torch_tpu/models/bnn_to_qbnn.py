"""BNN -> INT8 QBNN model surgery.

Counterpart of reference bayesian_torch/models/bnn_to_qbnn.py:45-259:
walks the nnx module graph and replaces Bayesian layers with their
``Quantized<Name>`` twins, harvesting calibration scales/zero-points
from the observers inserted by ``prepare()`` into each layer's
``quant_dict`` (same ordering: qint[2:] + quint, bnn_to_qbnn.py:105-111),
then calls ``quantize()``. Optional conv+BN folding follows the same
conv1/bn1/.../downsample naming conventions (:212-229).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

import bayesian_torch_tpu.layers as bayesian_layers
from bayesian_torch_tpu.layers.base_variational_layer import (
    BaseVariationalLayer,
)
from bayesian_torch_tpu.nn.modules import Identity

# the reference exposes torch.nn.quantized.BatchNorm2d under this name
# (bnn_to_qbnn.py:41); our int8 BN twin answers to it too
from bayesian_torch_tpu.layers.batchnorm import (  # noqa: F401
    QuantizedBatchNorm2d as QBatchNorm2d,
)


def get_scale_and_zero_point(x, upper_bound: float = 100,
                             target_range: int = 255):
    """Symmetric per-tensor INT8 qparams.

    Counterpart of reference bnn_to_qbnn.py:45-69: scale =
    2*clamp(max|x|, 0, upper_bound)/target_range, zero_point = 0.
    Returns python floats when ``x`` is concrete (so the scale is
    STATIC under jit and every requant multiplier constant-folds),
    traced scalars otherwise.
    """
    xmax = jnp.clip(jnp.max(jnp.abs(x)), 0, upper_bound)
    scale = xmax * 2.0 / target_range
    try:
        return float(scale), 0
    except (TypeError, jax.errors.TracerArrayConversionError):
        return scale, 0


def get_quantized_tensor(x, default_scale: float = 0.1):
    """Quantize a float tensor to a symmetric int8 QTensor.

    Counterpart of reference bnn_to_qbnn.py:71-94
    (torch.quantize_per_tensor to qint8): payload is int8 with
    zero_point 0; ``default_scale`` replaces a zero computed scale.
    """
    from bayesian_torch_tpu.ops.qtensor import QTensor
    scale, zp = get_scale_and_zero_point(x)
    if scale == 0:
        scale = default_scale
    q = jnp.clip(jnp.round(x * (1.0 / scale)), -128, 127).astype(jnp.int8)
    return QTensor(q, scale, zp)


def _harvest_quant_dict(d):
    """quant_dict = qint observers [2:] + quint observers, as
    (scale, zero_point) dicts (reference bnn_to_qbnn.py:105-111)."""
    if not getattr(d, "quant_prepare", False):
        return None
    obs = list(d.qint_quant)[2:] + list(d.quint_quant)
    if not all(ob.observed for ob in obs):
        # prepare() ran but no calibration data flowed: take the
        # reference's uncalibrated default-scale path instead of
        # harvesting meaningless observer ranges (zp=128 also lets the
        # zero-point correction fold away statically)
        return None
    qd = []
    for ob in obs:
        scale, zp = ob.calculate_qparams()
        if getattr(scale, "ndim", 0) > 0:
            raise ValueError(
                "quant_dict harvest is per-tensor (matching the "
                "reference's MinMax QuantStubs, bnn_to_qbnn.py:105-111) "
                f"but {type(ob).__name__} produced per-channel qparams; "
                "use MinMaxObserver/HistogramObserver in the QConfig "
                "passed to prepare(), or consume PerChannelMinMaxObserver "
                "qparams directly outside the quant_dict path.")
        qd.append({"scale": scale, "zero_point": zp})
    return qd


def _copy_layer_state(qbnn_layer, d):
    """Transfer posteriors/flags from the float Bayesian layer (the
    reference does a __dict__.update; explicit copies keep the nnx
    graph sane)."""
    for attr in ("mu_weight", "rho_weight", "mu_kernel", "rho_kernel",
                 "mu_bias", "rho_bias"):
        if getattr(d, attr, None) is not None:
            setattr(qbnn_layer, attr, getattr(d, attr))
    qbnn_layer.bias = getattr(d, "mu_bias", None) is not None
    qbnn_layer.quant_dict = _harvest_quant_dict(d)
    qbnn_layer.rngs = d.rngs


def qbnn_linear_layer(d):
    layer_fn = getattr(bayesian_layers, "Quantized" + type(d).__name__)
    qbnn_layer = layer_fn(in_features=d.in_features,
                          out_features=d.out_features)
    _copy_layer_state(qbnn_layer, d)
    qbnn_layer.quantize()
    if d.dnn_to_bnn_flag:
        qbnn_layer.dnn_to_bnn_flag = True
    return qbnn_layer


def qbnn_conv_layer(d):
    layer_fn = getattr(bayesian_layers, "Quantized" + type(d).__name__)
    qbnn_layer = layer_fn(
        in_channels=d.in_channels,
        out_channels=d.out_channels,
        kernel_size=d.kernel_size,
        stride=d.stride,
        padding=d.padding,
        dilation=d.dilation,
        groups=d.groups,
        output_padding=getattr(d, "output_padding", 0),
        data_format=getattr(d, "data_format", "NCHW"),
    )
    _copy_layer_state(qbnn_layer, d)
    qbnn_layer.quantize()
    if d.dnn_to_bnn_flag:
        qbnn_layer.dnn_to_bnn_flag = True
    return qbnn_layer


def qbnn_lstm_layer(d):
    """LSTM quantization: quantize the ih/hh linear blocks in place.

    The reference looks up a QuantizedLSTM* class that does not exist in
    its layer registry (bnn_to_qbnn.py:147-156 would raise) — here the
    cell's two linear sublayers are int8-quantized instead, which is the
    semantically equivalent (and actually working) behavior.
    """
    d.ih = qbnn_linear_layer(d.ih)
    d.hh = qbnn_linear_layer(d.hh)
    return d


def qbnn_batchnorm2d_layer(d):
    """BatchNorm2dLayer -> QuantizedBatchNorm2d swap.

    Counterpart of reference bnn_to_qbnn.py:158-171,235 (non-fused
    path): the quantized twin keeps running stats/affine params and
    requantizes its output so a QTensor input stays uint8 through BN.
    """
    from bayesian_torch_tpu.layers.batchnorm import QuantizedBatchNorm2d
    q = QuantizedBatchNorm2d(
        num_features=d.num_features, eps=d.eps, momentum=d.momentum,
        affine=d.affine, track_running_stats=d.track_running_stats,
        data_format=d.data_format)
    for attr in ("weight", "bias", "running_mean", "running_var",
                 "num_batches_tracked", "training", "stats_frozen"):
        if getattr(d, attr, None) is not None:
            setattr(q, attr, getattr(d, attr))
    return q


def batch_norm_folding(conv, bn):
    """Fold a BatchNorm's affine+stats into the quantized conv twin
    (reference bnn_to_qbnn.py:174-195)."""
    layer_fn = getattr(bayesian_layers, "Quantized" + type(conv).__name__)
    qbnn_layer = layer_fn(
        in_channels=conv.in_channels,
        out_channels=conv.out_channels,
        kernel_size=conv.kernel_size,
        stride=conv.stride,
        padding=conv.padding,
        dilation=conv.dilation,
        groups=conv.groups,
        output_padding=getattr(conv, "output_padding", 0),
        data_format=getattr(conv, "data_format", "NCHW"),
    )
    _copy_layer_state(qbnn_layer, conv)
    qbnn_layer.bn_weight = bn.weight
    qbnn_layer.bn_bias = bn.bias
    qbnn_layer.bn_running_mean = bn.running_mean
    qbnn_layer.bn_running_var = bn.running_var
    qbnn_layer.bn_eps = bn.eps
    qbnn_layer.quantize()
    if conv.dnn_to_bnn_flag:
        qbnn_layer.dnn_to_bnn_flag = True
    return qbnn_layer


def _children(m):
    return {name: v for name, v in vars(m).items()
            if isinstance(v, nnx.Module)}


def bnn_to_qbnn(m, fuse_conv_bn: bool = False,
                quantize_activations: bool = False,
                quantize_batchnorm: bool = False):
    """In-place surgery: Bayesian layers -> Quantized twins.

    Mirrors reference bnn_to_qbnn.py:198-237 including the conv+BN
    fusion driven by conv1/bn1..conv3/bn3 and downsample=[conv, bn]
    naming conventions.

    ``quantize_activations=True`` sets ``q_output`` on every quantized
    CONV layer so activations stay uint8 between layers (QTensor flow,
    ops/qtensor.py) — the torch-equivalent of keeping quantized tensors
    flowing through QuantStubs. Linear layers still emit fp32 so model
    heads return plain arrays.

    ``quantize_batchnorm=True`` additionally swaps BatchNorm layers for
    ``QuantizedBatchNorm2d`` (reference bnn_to_qbnn.py:235's non-fused
    path), whose output is requantized uint8. Off by default: the float
    BN already consumes QTensors, and a fixed BN output scale costs
    PTQ fidelity; prefer ``fuse_conv_bn=True`` where BN disappears into
    the conv entirely.
    """
    children = _children(m)
    for name, value in children.items():
        cls_name = type(value).__name__
        if cls_name.startswith("Quantized"):
            continue
        grand = _children(value)
        is_bayes_lstm = "LSTM" in cls_name and isinstance(
            value, BaseVariationalLayer)
        if grand and not is_bayes_lstm:
            if "Conv" in cls_name and isinstance(value,
                                                 BaseVariationalLayer):
                ql = qbnn_conv_layer(value)
                ql.q_output = quantize_activations
                setattr(m, name, ql)
            elif "Linear" in cls_name and isinstance(value,
                                                     BaseVariationalLayer):
                setattr(m, name, qbnn_linear_layer(value))
            else:
                bnn_to_qbnn(value, fuse_conv_bn=fuse_conv_bn,
                            quantize_activations=quantize_activations,
                            quantize_batchnorm=quantize_batchnorm)
        elif "Linear" in cls_name and isinstance(value,
                                                 BaseVariationalLayer):
            setattr(m, name, qbnn_linear_layer(value))
        elif is_bayes_lstm:
            setattr(m, name, qbnn_lstm_layer(value))
        elif "Conv" in cls_name and isinstance(value,
                                               BaseVariationalLayer):
            if not fuse_conv_bn:
                ql = qbnn_conv_layer(value)
                ql.q_output = quantize_activations
                setattr(m, name, ql)
            # fused convs are handled below via naming conventions
        elif quantize_batchnorm and not fuse_conv_bn \
                and "Batch" in cls_name:
            setattr(m, name, qbnn_batchnorm2d_layer(value))

    if fuse_conv_bn:
        children = _children(m)
        for i in ("1", "2", "3"):
            cname, bname = f"conv{i}", f"bn{i}"
            if cname in children and bname in children:
                conv, bn = children[cname], children[bname]
                if (isinstance(conv, BaseVariationalLayer)
                        and "Identity" not in type(bn).__name__):
                    ql = batch_norm_folding(conv, bn)
                    ql.q_output = quantize_activations
                    setattr(m, cname, ql)
                    setattr(m, bname, Identity())
        ds = getattr(m, "downsample", None)
        if ds is not None and type(ds).__name__ == "Sequential" \
                and len(ds) == 2:
            if (isinstance(ds[0], BaseVariationalLayer)
                    and "Identity" not in type(ds[1]).__name__):
                ql = batch_norm_folding(ds[0], ds[1])
                ql.q_output = quantize_activations
                ds._0 = ql
                ds._1 = Identity()
    return
