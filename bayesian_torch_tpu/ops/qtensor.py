"""Quantized activation tensor: uint8 values + static (scale, zero_point).

The reference's calibrated INT8 path keeps activations quantized across
layer boundaries through torch's QuantStub/FloatFunctional machinery
(ao/quantization/quantize.py:49-131 add_relu FloatFunctionals;
quantized layers consume/produce quantized tensors). Round 1 of this
framework instead dequantized to fp32 at every quantized layer's exit
and re-quantized at the next entry — which costs several full fp32
HBM passes over every activation per layer and made INT8 barely faster
than bf16 (VERDICT K4).

``QTensor`` is the TPU-native equivalent of torch's quantized tensor:
a registered pytree carrying a uint8 payload with the quantization
parameters as STATIC aux data, so every requantization multiplier
constant-folds under jit. Model-level ops dispatch on it:

- ``relu(qt)``      -> max(q, zp)                  (exact, single pass)
- ``qt + qt``       -> qa + qb - zp when scales match (exact integer
                       add); falls back to fp32 when they differ
- ``max_pool``      -> uint8 reduce_window (max is monotonic: exact)
- anything else     -> ``dequantize()`` first

With the uncalibrated default path (every tensor at scale=0.2, zp=128)
the whole uint8 flow is arithmetically identical to the fp32
round-trip flow — only the HBM traffic changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Fully-int8 residual adds for DIFFERING operand scales (the calibrated
# path): when True, QTensor + QTensor requantizes both operands and adds
# in uint8 (QTensor.add_q — the reference's add_relu FloatFunctional
# semantics) instead of falling back to an exact fp32 add. Same-scale
# adds are always exact uint8 regardless. Opt-in because the fp32
# fallback is strictly MORE accurate; flip it (or call add_q with a
# calibrated output scale) to keep the whole residual stream in uint8.
# TRACE-TIME flag: it selects the add lowering while a function is
# being traced, so set it BEFORE the first call of a jitted forward —
# jit's cache does not key on it, and flipping it afterwards leaves
# already-compiled executables on their old path (re-jit / clear
# caches to switch an existing function).
INT8_RESIDUAL_ADD = False


@jax.tree_util.register_pytree_node_class
class QTensor:
    """uint8 activation + static (scale, zero_point) quant params."""

    __slots__ = ("q", "scale", "zp")

    def __init__(self, q, scale: float, zp: int):
        self.q = q
        self.scale = float(scale)
        self.zp = int(zp)

    # -- pytree: q dynamic, (scale, zp) static -------------------------
    def tree_flatten(self):
        return (self.q,), (self.scale, self.zp)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.q = children[0]
        obj.scale, obj.zp = aux
        return obj

    # -- array-ish surface --------------------------------------------
    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        return self.q.dtype

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return QTensor(self.q.reshape(shape), self.scale, self.zp)

    def __getitem__(self, idx):
        return QTensor(self.q[idx], self.scale, self.zp)

    def dequantize(self):
        return (self.q.astype(jnp.float32) - self.zp) * self.scale

    def requantize(self, scale: float, zp: int) -> "QTensor":
        """Direct uint8 -> uint8 rescale (no fp32 round trip in HBM)."""
        if scale == self.scale and zp == self.zp:
            return self
        r = jnp.round((self.q.astype(jnp.float32) - self.zp)
                      * (self.scale / scale)) + zp
        return QTensor(jnp.clip(r, 0, 255).astype(jnp.uint8), scale, zp)

    # -- arithmetic ----------------------------------------------------
    def add_q(self, other: "QTensor", scale: float = None,
              zp: int = None) -> "QTensor":
        """uint8 add with requant — the reference's FloatFunctional
        add semantics (ao/quantization/quantize.py:49-131 wires ResNet
        skip-connections through quantized add_relu, so the residual
        sum never leaves uint8). Differing operand scales requantize
        into ``scale``/``zp``; the default output scale ``sa + sb``
        exactly covers the sum's representable range (a calibrated
        deployment passes the observed output scale instead)."""
        if scale is None:
            scale = self.scale + other.scale
        if zp is None:
            zp = self.zp
        a = (self.q.astype(jnp.float32) - self.zp) * (self.scale / scale)
        b = (other.q.astype(jnp.float32) - other.zp) * (other.scale
                                                        / scale)
        s = jnp.round(a + b) + zp
        return QTensor(jnp.clip(s, 0, 255).astype(jnp.uint8), scale, zp)

    def __add__(self, other):
        if isinstance(other, QTensor):
            if other.scale == self.scale and other.zp == self.zp:
                # s(qa-z) + s(qb-z) quantized back at scale s:
                # q = qa + qb - z (exact; int32 to avoid uint8 wrap)
                s = (self.q.astype(jnp.int32) + other.q.astype(jnp.int32)
                     - self.zp)
                return QTensor(jnp.clip(s, 0, 255).astype(jnp.uint8),
                               self.scale, self.zp)
            if INT8_RESIDUAL_ADD:
                return self.add_q(other)
            return self.dequantize() + other.dequantize()
        return self.dequantize() + other

    def __radd__(self, other):
        if isinstance(other, (int, float)) and other == 0:
            return self
        return other + self.dequantize()

    def relu(self) -> "QTensor":
        """max(x, 0) == max(q, zp) in the quantized domain (exact)."""
        return QTensor(jnp.maximum(self.q, jnp.uint8(self.zp)),
                       self.scale, self.zp)

    def __repr__(self):
        return (f"QTensor(shape={tuple(self.q.shape)}, "
                f"scale={self.scale}, zp={self.zp})")


def relu(x):
    """ReLU that dispatches on QTensor (stays uint8) or arrays."""
    if isinstance(x, QTensor):
        return x.relu()
    return jax.nn.relu(x)


def dequantize_if_qtensor(x):
    return x.dequantize() if isinstance(x, QTensor) else x
