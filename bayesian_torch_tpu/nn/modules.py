"""Deterministic torch-style nnx modules (Linear/Conv/LSTM/pools/etc.).

Parameter layouts and default initializers match torch so the
deterministic zoo is interchangeable with the reference's
(models/deterministic/*): kaiming-uniform(a=sqrt(5)) weights and
U(+-1/sqrt(fan_in)) biases.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import (
    default_rngs,
    get_kernel_size,
)
from bayesian_torch_tpu.layers.batchnorm import _BatchNormNdLayer
from bayesian_torch_tpu.nn import functional as F
from bayesian_torch_tpu.ops import conv as conv_ops


def _kaiming_uniform(key, shape, fan_in):
    # torch nn.init.kaiming_uniform_(a=sqrt(5)): gain = sqrt(2/(1+5)),
    # bound = gain * sqrt(3/fan_in) = sqrt(1/fan_in)
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


class Linear(nnx.Module):
    """torch.nn.Linear twin: weight (out_features, in_features)."""

    def __init__(self, in_features: int, out_features: int,
                 bias: bool = True, *, rngs: Optional[nnx.Rngs] = None):
        if rngs is None:
            rngs = default_rngs()
        self.in_features = in_features
        self.out_features = out_features
        # like the Bayesian layers: when set (e.g. bf16), the GEMM runs
        # and emits in that dtype (params stay fp32 master copies)
        self.compute_dtype = None
        self.weight = nnx.Param(_kaiming_uniform(
            rngs.params(), (out_features, in_features), in_features))
        if bias:
            self.bias = nnx.Param(_kaiming_uniform(
                rngs.params(), (out_features,), in_features))
        else:
            self.bias = None

    def __call__(self, x):
        w = self.weight[...]
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            w = w.astype(self.compute_dtype)
        out = x @ w.T
        if self.bias is not None:
            out = out + self.bias[...].astype(out.dtype)
        return out

    def __repr__(self):
        return f"Linear(in_features={self.in_features}, out_features={self.out_features})"


class _ConvNd(nnx.Module):
    nd = 2
    transposed = False

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 output_padding=0, *, rngs: Optional[nnx.Rngs] = None,
                 data_format: str = "NCHW"):
        if rngs is None:
            rngs = default_rngs()
        kernel_size = get_kernel_size(kernel_size, self.nd)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.output_padding = output_padding
        self.data_format = data_format
        # bf16 conv emission, matching the Bayesian conv layers'
        # compute_dtype contract (ops/conv.py _accum_dtype)
        self.compute_dtype = None
        # Deterministic (unbatched-weight) pointwise convs run ~9%
        # faster as channel dots on v5e (ops/conv.py CONV_1X1_DOT
        # notes). Set False when vmapping weights over this module —
        # the batched-dot form breaks epilogue fusion.
        self.pointwise_dot = True

        if self.transposed:
            shape = (in_channels, out_channels // groups) + kernel_size
        else:
            shape = (out_channels, in_channels // groups) + kernel_size
        fan_in = (in_channels // groups) * math.prod(kernel_size)
        self.weight = nnx.Param(_kaiming_uniform(rngs.params(), shape,
                                                 fan_in))
        if bias:
            self.bias = nnx.Param(_kaiming_uniform(
                rngs.params(), (out_channels,), fan_in))
        else:
            self.bias = None

    def __call__(self, x):
        b = self.bias[...] if self.bias is not None else None
        if self.transposed:
            return conv_ops.conv_transpose_nd(
                x, self.weight[...], b, stride=self.stride,
                padding=self.padding, output_padding=self.output_padding,
                dilation=self.dilation, groups=self.groups,
                compute_dtype=self.compute_dtype,
                data_format=self.data_format)
        return conv_ops.conv_nd(
            x, self.weight[...], b, stride=self.stride,
            padding=self.padding, dilation=self.dilation,
            groups=self.groups, compute_dtype=self.compute_dtype,
            data_format=self.data_format,
            pointwise_dot=getattr(self, "pointwise_dot", None))

    def __repr__(self):
        return (f"{type(self).__name__}({self.in_channels}, "
                f"{self.out_channels}, kernel_size={self.kernel_size})")


class Conv1d(_ConvNd):
    nd = 1


class Conv2d(_ConvNd):
    nd = 2


class Conv3d(_ConvNd):
    nd = 3


class ConvTranspose1d(_ConvNd):
    nd = 1
    transposed = True


class ConvTranspose2d(_ConvNd):
    nd = 2
    transposed = True


class ConvTranspose3d(_ConvNd):
    nd = 3
    transposed = True


class LSTM(nnx.Module):
    """Single-layer batch-first deterministic LSTM (torch gate order
    i,f,g,o), the deterministic twin of the Bayesian LSTM layers.

    Exposes ``input_size``/``hidden_size`` attributes for dnn_to_bnn
    (reference dnn_to_bnn.py:106-117 reads those names).
    """

    def __init__(self, input_size: int, hidden_size: int, bias: bool = True,
                 *, rngs: Optional[nnx.Rngs] = None):
        if rngs is None:
            rngs = default_rngs()
        self.input_size = input_size
        self.hidden_size = hidden_size
        k = 1.0 / math.sqrt(hidden_size)

        def u(key, shape):
            return jax.random.uniform(key, shape, minval=-k, maxval=k)

        self.weight_ih = nnx.Param(u(rngs.params(),
                                     (4 * hidden_size, input_size)))
        self.weight_hh = nnx.Param(u(rngs.params(),
                                     (4 * hidden_size, hidden_size)))
        if bias:
            self.bias_ih = nnx.Param(u(rngs.params(), (4 * hidden_size,)))
            self.bias_hh = nnx.Param(u(rngs.params(), (4 * hidden_size,)))
        else:
            self.bias_ih = None
            self.bias_hh = None

    @property
    def bias(self):
        return self.bias_ih

    def __call__(self, X, hidden_states=None):
        batch, seq, _ = X.shape
        HS = self.hidden_size
        if hidden_states is None:
            h0 = jnp.zeros((batch, HS), X.dtype)
            c0 = jnp.zeros((batch, HS), X.dtype)
        else:
            h0, c0 = hidden_states

        w_ih = self.weight_ih[...]
        w_hh = self.weight_hh[...]
        b = None
        if self.bias_ih is not None:
            b = self.bias_ih[...] + self.bias_hh[...]

        def step(carry, x_t):
            h, c = carry
            gates = x_t @ w_ih.T + h @ w_hh.T
            if b is not None:
                gates = gates + b
            i_t = jax.nn.sigmoid(gates[:, :HS])
            f_t = jax.nn.sigmoid(gates[:, HS:2 * HS])
            g_t = jnp.tanh(gates[:, 2 * HS:3 * HS])
            o_t = jax.nn.sigmoid(gates[:, 3 * HS:])
            c = f_t * c + i_t * g_t
            h = o_t * jnp.tanh(c)
            return (h, c), h

        (h_n, c_n), h_seq = jax.lax.scan(step, (h0, c0),
                                         jnp.swapaxes(X, 0, 1))
        return jnp.swapaxes(h_seq, 0, 1), (h_n, c_n)

    def __repr__(self):
        return f"LSTM({self.input_size}, {self.hidden_size})"


class BatchNorm1d(_BatchNormNdLayer):
    nd = 1


class BatchNorm2d(_BatchNormNdLayer):
    nd = 2


class BatchNorm3d(_BatchNormNdLayer):
    nd = 3


class _PoolNd(nnx.Module):
    nd = 2
    op = "max"

    def __init__(self, kernel_size, stride=None, padding=0, *,
                 data_format: str = "NCHW"):
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.data_format = data_format

    def __call__(self, x):
        fn = F.max_pool_nd if self.op == "max" else F.avg_pool_nd
        return fn(x, self.kernel_size, self.stride, self.padding,
                  data_format=self.data_format)


class MaxPool1d(_PoolNd):
    nd = 1
    op = "max"


class MaxPool2d(_PoolNd):
    nd = 2
    op = "max"


class MaxPool3d(_PoolNd):
    nd = 3
    op = "max"


class AvgPool1d(_PoolNd):
    nd = 1
    op = "avg"


class AvgPool2d(_PoolNd):
    nd = 2
    op = "avg"


class AvgPool3d(_PoolNd):
    nd = 3
    op = "avg"


class _AdaptiveAvgPoolNd(nnx.Module):
    def __init__(self, output_size, *, data_format: str = "NCHW"):
        self.output_size = output_size
        self.data_format = data_format

    def __call__(self, x):
        return F.adaptive_avg_pool_nd(x, self.output_size,
                                      data_format=self.data_format)


class AdaptiveAvgPool1d(_AdaptiveAvgPoolNd):
    pass


class AdaptiveAvgPool2d(_AdaptiveAvgPoolNd):
    pass


class AdaptiveAvgPool3d(_AdaptiveAvgPoolNd):
    pass


class ReLU(nnx.Module):
    def __init__(self, inplace: bool = False):
        self.inplace = inplace

    def __call__(self, x):
        return jax.nn.relu(x)


class Dropout(nnx.Module):
    def __init__(self, p: float = 0.5, *, rngs: Optional[nnx.Rngs] = None):
        self.p = p
        self.training = True
        self.rngs = rngs if rngs is not None else default_rngs()

    def train(self):
        self.training = True

    def eval(self):
        self.training = False

    def __call__(self, x):
        if not self.training or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(self.rngs.noise(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Dropout2d(Dropout):
    """Channel dropout (zeroes whole channels, NCHW), torch.nn.Dropout2d."""

    def __call__(self, x):
        if not self.training or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(self.rngs.noise(), keep,
                                    x.shape[:2] + (1,) * (x.ndim - 2))
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Identity(nnx.Module):
    def __call__(self, x):
        return x


class Flatten(nnx.Module):
    def __init__(self, start_dim: int = 1, end_dim: int = -1):
        self.start_dim = start_dim
        self.end_dim = end_dim

    def __call__(self, x):
        start = self.start_dim
        end = self.end_dim if self.end_dim >= 0 else x.ndim + self.end_dim
        shape = x.shape[:start] + (-1,) + x.shape[end + 1:]
        return x.reshape(shape)


class Sequential(nnx.Module):
    """torch.nn.Sequential twin that also threads (x, kl) tuples: if a
    submodule returns a tuple, the kl is accumulated and the tuple is
    re-formed, so Bayesian downsample paths (reference
    resnet_variational_large.py:193-203) compose."""

    def __init__(self, *mods):
        self._num = len(mods)
        for i, mod in enumerate(mods):
            setattr(self, f"_{i}", mod)

    def __iter__(self):
        return (getattr(self, f"_{i}") for i in range(self._num))

    def __getitem__(self, i):
        return getattr(self, f"_{i % self._num}")

    def __len__(self):
        return self._num

    def __call__(self, x):
        kl_total = None
        for mod in self:
            out = mod(x)
            if isinstance(out, tuple) and len(out) == 2:
                x, kl = out
                if kl_total is None:
                    kl_total = kl
                else:
                    kl_total = kl_total + kl
            else:
                x = out
        if kl_total is not None:
            return x, kl_total
        return x
