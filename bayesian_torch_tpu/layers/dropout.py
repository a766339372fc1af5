"""Dropout wrapper with the (x, kl) tuple convention.

Counterpart of reference layers/dropout.py:11-25: consumes ``(x, kl)``
tuples (or bare arrays) and returns ``(out, 0)``.
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import default_rngs


class Dropout(nnx.Module):

    def __init__(self, p: float = 0.5, inplace: bool = False, *,
                 rngs: Optional[nnx.Rngs] = None):
        if p < 0 or p > 1:
            raise ValueError(
                "dropout probability has to be between 0 and 1, "
                f"but got {p}")
        self.p = p
        self.inplace = inplace  # accepted for API parity; meaningless in JAX
        self.training = True
        self.rngs = rngs if rngs is not None else default_rngs()

    def train(self):
        self.training = True

    def eval(self):
        self.training = False

    def _drop(self, x):
        if not self.training or self.p == 0.0:
            return x
        if self.p == 1.0:
            return x * 0.0
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(self.rngs.noise(), keep, x.shape)
        return jax.numpy.where(mask, x / keep, 0.0).astype(x.dtype)

    def __call__(self, input):
        if isinstance(input, tuple):
            x, _ = input
            return self._drop(x), 0
        return self._drop(input)
