"""DNN -> BNN model surgery.

TPU-native counterpart of reference bayesian_torch/models/dnn_to_bnn.py:
walks an nnx module graph and replaces deterministic Conv/Linear/LSTM
submodules in place with their Bayesian twins, driven by the same
``bnn_prior_parameters`` dict the reference documents
(dnn_to_bnn.py:41-49):

    {
      "prior_mu": 0.0,
      "prior_sigma": 1.0,
      "posterior_mu_init": 0.0,
      "posterior_rho_init": -3.0,
      "type": "Reparameterization",  # or "Flipout"
      "moped_enable": False,
      "moped_delta": 0.5,
    }

Because nnx modules are ordinary mutable Python objects, the surgery is
the same setattr recursion the reference uses on torch modules
(dnn_to_bnn.py:127-154). Supported inputs:

- this framework's deterministic ``bayesian_torch_tpu.nn`` modules
  (Linear/Conv*/ConvTranspose*/LSTM) - the primary path;
- ``flax.nnx.Linear``, ``flax.nnx.Conv`` and ``flax.nnx.ConvTranspose``
  (kernel layouts transposed, NHWC data_format configured
  automatically, flax 'SAME'/'VALID' padding translated to the
  equivalent torch padding/output_padding geometry);
- ``flax.nnx.RNN`` wrapping an LSTM cell, and bare
  ``nnx.LSTMCell``/``nnx.OptimizedLSTMCell`` (both become the
  full-sequence Bayesian LSTM twin with the reference's torch-style
  ``(seq, (h_seq, c_seq))`` return contract — callers must unpack).

Deviations from the reference, by design:
- ``output_padding`` IS forwarded for transposed convs (the reference
  silently drops it, dnn_to_bnn.py:76-92);
- ``get_kl_loss`` counts each Bayesian layer once (the reference's
  module walk double-counts LSTM internals because the LSTM's kl_loss
  already sums its ih/hh children, dnn_to_bnn.py:157-165 +
  rnn_variational.py:98-101).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

import bayesian_torch_tpu.layers as bayesian_layers
from bayesian_torch_tpu.layers.base_variational_layer import (
    BaseVariationalLayer,
)
from bayesian_torch_tpu.utils.util import get_rho


def _moped_init(bnn_layer, weight, bias, delta, kernel_attr):
    """MOPED empirical-Bayes init: mu <- w, rho <- get_rho(w, delta)
    (reference dnn_to_bnn.py:64-72)."""
    getattr(bnn_layer, "mu_" + kernel_attr)[...] = weight
    getattr(bnn_layer, "rho_" + kernel_attr)[...] = get_rho(weight, delta)
    if bnn_layer.mu_bias is not None and bias is not None:
        bnn_layer.mu_bias[...] = bias
        bnn_layer.rho_bias[...] = get_rho(bias, delta)


def bnn_linear_layer(params, d):
    """Replace a deterministic linear with its Bayesian twin.

    Reference: dnn_to_bnn.py:52-73.
    """
    layer_type = type(d).__name__ + params["type"]
    layer_fn = getattr(bayesian_layers, layer_type)

    is_flax = hasattr(d, "kernel")  # nnx.Linear
    if is_flax:
        has_bias = d.use_bias
        weight = jnp.transpose(d.kernel[...])  # (in,out) -> (out,in)
        bias = d.bias[...] if has_bias else None
    else:
        has_bias = d.bias is not None
        weight = d.weight[...]
        bias = d.bias[...] if has_bias else None

    bnn_layer = layer_fn(
        in_features=d.in_features,
        out_features=d.out_features,
        prior_mean=params["prior_mu"],
        prior_variance=params["prior_sigma"],
        posterior_mu_init=params["posterior_mu_init"],
        posterior_rho_init=params["posterior_rho_init"],
        bias=has_bias,
    )
    if params.get("moped_enable", False):
        _moped_init(bnn_layer, weight, bias, params["moped_delta"], "weight")
    bnn_layer.dnn_to_bnn_flag = True
    return bnn_layer


def _flax_ct_geometry(d, nd):
    """Translate flax ConvTranspose geometry to torch conv-transpose
    (padding, output_padding).

    Our conv-transpose lowers to a regular conv with per-dim padding
    (ke-1-p, ke-1-p+op) where ke = dil*(k-1)+1 (ops/conv.py:121-125);
    flax routes string padding through lax.conv_transpose's
    _conv_transpose_padding, which yields (pad_a, pad_b) per dim.
    Matching the two gives the exact closed form p = ke-1-pad_a,
    op = pad_b-pad_a for EVERY (k, s, dil) — including the SAME
    odd-crop cases (op = -1, crops one extra on the right) and the
    VALID k<s cases (op = s-ke) that round 2 refused. torch itself
    restricts op to [0, max(stride, dilation)); our layer's direct
    padding lowering has no such restriction, so the converted layer
    is function-preserving even where strict torch geometry isn't.
    (Reference converts every name-matched layer unconditionally,
    dnn_to_bnn.py:127-154.)
    """
    strides = d.strides or 1
    dil = d.kernel_dilation or 1
    ks = d.kernel_size
    s_t = (strides,) * nd if isinstance(strides, int) else tuple(strides)
    d_t = (dil,) * nd if isinstance(dil, int) else tuple(dil)

    if d.padding in ("VALID", "SAME"):
        pads, out_pads = [], []
        for k, s, di in zip(ks, s_t, d_t):
            ke = di * (k - 1) + 1  # dilated kernel extent
            if d.padding == "VALID":
                pad_a = ke - 1
                pad_b = s - 1 + max(ke - s, 0)
            else:  # SAME
                pad_len = ke + s - 2
                pad_a = ke - 1 if s > ke - 1 else -(-pad_len // 2)
                pad_b = pad_len - pad_a
            pads.append(ke - 1 - pad_a)
            out_pads.append(pad_b - pad_a)
        return tuple(pads), tuple(out_pads), strides, dil
    # explicit numeric padding: symmetric ints only
    pad = d.padding
    if isinstance(pad, int):
        return pad, 0, strides, dil
    pads = []
    for pp in pad:
        lo, hi = (pp, pp) if isinstance(pp, int) else pp
        if lo != hi:
            raise ValueError(
                "asymmetric flax ConvTranspose padding has no torch "
                "conv-transpose equivalent")
        pads.append(lo)
    return tuple(pads), 0, strides, dil


def bnn_conv_layer(params, d):
    """Replace a deterministic conv with its Bayesian twin.

    Reference: dnn_to_bnn.py:76-103. Unlike the reference we forward
    output_padding for transposed convs.
    """
    cls_name = type(d).__name__
    is_flax = cls_name == "Conv"  # nnx.Conv
    if cls_name == "ConvTranspose":  # nnx.ConvTranspose
        nd = len(d.kernel_size)
        layer_type = f"ConvTranspose{nd}d" + params["type"]
        has_bias = d.use_bias
        padding, output_padding, strides, dil = _flax_ct_geometry(d, nd)
        kwargs = dict(
            in_channels=d.in_features,
            out_channels=d.out_features,
            kernel_size=d.kernel_size,
            stride=strides,
            padding=padding,
            output_padding=output_padding,
            dilation=dil,
            data_format="NHWC",
        )
        kernel = d.kernel[...]
        if getattr(d, "transpose_kernel", False):
            # (*k, out, in) -> (in, out, *k); flax flips spatially in
            # this mode, matching torch's gradient-style transpose
            perm = (nd + 1, nd) + tuple(range(nd))
            weight = jnp.transpose(kernel, perm)
        else:
            # (*k, in, out) -> (in, out, *k); flax does NOT flip the
            # kernel in this mode while torch conv_transpose does, so
            # mirror the spatial axes to preserve the function
            perm = (nd, nd + 1) + tuple(range(nd))
            weight = jnp.transpose(kernel, perm)
            weight = weight[(slice(None), slice(None))
                            + (slice(None, None, -1),) * nd]
        bias = d.bias[...] if has_bias else None
    elif is_flax:
        nd = len(d.kernel_size)
        layer_type = f"Conv{nd}d" + params["type"]
        has_bias = d.use_bias
        groups = d.feature_group_count
        kwargs = dict(
            in_channels=d.in_features,
            out_channels=d.out_features,
            kernel_size=d.kernel_size,
            stride=d.strides,
            padding=d.padding,
            dilation=d.kernel_dilation,
            groups=groups,
            data_format="NHWC",
        )
        # HWIO (*k, in/g, out) -> OIHW (out, in/g, *k)
        kernel = d.kernel[...]
        perm = (nd + 1, nd) + tuple(range(nd))
        weight = jnp.transpose(kernel, perm)
        bias = d.bias[...] if has_bias else None
    else:
        layer_type = cls_name + params["type"]
        has_bias = d.bias is not None
        kwargs = dict(
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
        weight = d.weight[...]
        bias = d.bias[...] if has_bias else None

    layer_fn = getattr(bayesian_layers, layer_type)
    bnn_layer = layer_fn(
        prior_mean=params["prior_mu"],
        prior_variance=params["prior_sigma"],
        posterior_mu_init=params["posterior_mu_init"],
        posterior_rho_init=params["posterior_rho_init"],
        bias=has_bias,
        **kwargs,
    )
    if params.get("moped_enable", False):
        _moped_init(bnn_layer, weight, bias, params["moped_delta"], "kernel")
    bnn_layer.dnn_to_bnn_flag = True
    return bnn_layer


def bnn_lstm_layer(params, d):
    """Replace a deterministic LSTM (ours, an ``nnx.RNN`` over an LSTM
    cell, or a bare ``nnx.LSTMCell``/``OptimizedLSTMCell``) with the
    Bayesian full-sequence LSTM twin.

    Reference: dnn_to_bnn.py:106-122 (MOPED unsupported, warning only).
    """
    cell = d.cell if isinstance(d, nnx.RNN) else d
    in_features = getattr(cell, "input_size",
                          getattr(cell, "in_features", None))
    hidden = getattr(cell, "hidden_size",
                     getattr(cell, "hidden_features", None))
    if in_features is None or hidden is None:
        raise ValueError(
            f"cannot infer LSTM geometry from {type(d).__name__}")
    if hasattr(cell, "bias"):
        has_bias = cell.bias is not None
    else:
        has_bias = True  # flax LSTM cells always carry gate biases
    layer_type = "LSTM" + params["type"]
    layer_fn = getattr(bayesian_layers, layer_type)
    bnn_layer = layer_fn(
        in_features=in_features,
        out_features=hidden,
        prior_mean=params["prior_mu"],
        prior_variance=params["prior_sigma"],
        posterior_mu_init=params["posterior_mu_init"],
        posterior_rho_init=params["posterior_rho_init"],
        bias=has_bias,
    )
    if params.get("moped_enable", False):
        print("WARNING: MOPED method is not supported for LSTM layers!!!")
    bnn_layer.dnn_to_bnn_flag = True
    return bnn_layer


def _has_module_children(m: nnx.Module) -> bool:
    return any(isinstance(v, nnx.Module) for v in vars(m).values())


def dnn_to_bnn(m: nnx.Module, bnn_prior_parameters: dict) -> None:
    """In-place surgery: recurse the module tree and swap any submodule
    whose class name contains Conv/Linear/LSTM for its Bayesian twin.

    Mirrors reference dnn_to_bnn.py:127-154 (recurse-first, then
    name-match). Returns None; ``m`` is modified in place.
    """
    for name, value in list(vars(m).items()):
        if not isinstance(value, nnx.Module):
            continue
        if isinstance(value, BaseVariationalLayer):
            continue  # already Bayesian
        cls_name = type(value).__name__
        if isinstance(value, nnx.RNN):
            # replace the whole recurrence (cell included) when the
            # cell is an LSTM; other cell types recurse as usual
            if "LSTM" in type(value.cell).__name__:
                setattr(m, name, bnn_lstm_layer(bnn_prior_parameters,
                                                value))
            else:
                dnn_to_bnn(value, bnn_prior_parameters)
        elif "LSTM" in cls_name:
            setattr(m, name, bnn_lstm_layer(bnn_prior_parameters, value))
        elif _has_module_children(value):
            dnn_to_bnn(value, bnn_prior_parameters)
        elif "Conv" in cls_name:
            setattr(m, name, bnn_conv_layer(bnn_prior_parameters, value))
        elif "Linear" in cls_name:
            setattr(m, name, bnn_linear_layer(bnn_prior_parameters, value))
    return None


def iter_bayesian_layers(m: nnx.Module):
    """Yield every Bayesian layer exactly once, without descending into a
    Bayesian composite's own children (an LSTM's ih/hh KL is already part
    of the LSTM's kl_loss, rnn_variational.py:98-101)."""
    seen = set()

    def _walk(mod):
        if id(mod) in seen:
            return
        seen.add(id(mod))
        if isinstance(mod, BaseVariationalLayer):
            yield mod
            return
        for v in vars(mod).values():
            if isinstance(v, nnx.Module):
                yield from _walk(v)

    yield from _walk(m)


def get_kl_loss(m: nnx.Module):
    """Sum per-layer KL over all Bayesian layers (each counted once).

    Reference: dnn_to_bnn.py:157-165.
    """
    kl_loss = None
    for layer in iter_bayesian_layers(m):
        kl = layer.kl_loss()
        kl_loss = kl if kl_loss is None else kl_loss + kl
    return kl_loss
