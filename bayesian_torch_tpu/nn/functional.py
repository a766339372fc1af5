"""Deterministic functional ops (pooling etc.) with torch semantics, NC* layout."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from bayesian_torch_tpu.ops.qtensor import (  # noqa: F401  (re-export)
    QTensor,
    dequantize_if_qtensor,
    relu,
)


def _ntuple(x, n) -> Tuple[int, ...]:
    if isinstance(x, (tuple, list)):
        return tuple(int(v) for v in x)
    return (int(x),) * n


def _pool_dims(x, kernel_size, stride, padding, data_format):
    nd = x.ndim - 2
    k = _ntuple(kernel_size, nd)
    s = _ntuple(stride if stride is not None else kernel_size, nd)
    p = _ntuple(padding, nd)
    if data_format == "NCHW":
        window = (1, 1) + k
        strides = (1, 1) + s
        pads = ((0, 0), (0, 0)) + tuple((pi, pi) for pi in p)
    else:  # channels-last
        window = (1,) + k + (1,)
        strides = (1,) + s + (1,)
        pads = ((0, 0),) + tuple((pi, pi) for pi in p) + ((0, 0),)
    return k, window, strides, pads


def max_pool_nd(x, kernel_size, stride=None, padding=0, *,
                data_format="NCHW"):
    """torch max_pool{1,2,3}d (-inf padding); data_format NCHW or NHWC.

    QTensor inputs pool directly on the uint8 payload (max is monotonic
    in the quantized domain; uint8 pad value 0 represents the most
    negative representable real, the -inf analog)."""
    if isinstance(x, QTensor):
        _, window, strides, pads = _pool_dims(x.q, kernel_size, stride,
                                              padding, data_format)
        out = jax.lax.reduce_window(x.q, jnp.uint8(0), jax.lax.max,
                                    window, strides, pads)
        return QTensor(out, x.scale, x.zp)
    _, window, strides, pads = _pool_dims(x, kernel_size, stride, padding,
                                          data_format)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides,
                                 pads)


def avg_pool_nd(x, kernel_size, stride=None, padding=0,
                count_include_pad=True, *, data_format="NCHW"):
    """torch avg_pool{1,2,3}d; data_format NCHW or NHWC."""
    x = dequantize_if_qtensor(x)
    k, window, strides, pads = _pool_dims(x, kernel_size, stride, padding,
                                          data_format)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    if count_include_pad:
        denom = 1.0
        for ki in k:
            denom *= ki
        return summed / denom
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides,
                                   pads)
    return summed / counts


def adaptive_avg_pool_nd(x, output_size, *, data_format="NCHW"):
    """torch adaptive_avg_pool{1,2,3}d for the common exact-divisor case
    (covers the model zoo's global-average-pool usage)."""
    nd = x.ndim - 2
    out = _ntuple(output_size, nd)
    in_sp = x.shape[2:] if data_format == "NCHW" else x.shape[1:-1]
    for i, o in enumerate(out):
        if in_sp[i] % o != 0:
            raise NotImplementedError(
                "adaptive pooling requires input size divisible by output "
                f"size (got {in_sp[i]} -> {o})")
    k = tuple(in_sp[i] // out[i] for i in range(nd))
    return avg_pool_nd(x, k, stride=k, data_format=data_format)
