"""ReLU wrapper with the (x, kl) tuple convention.

Counterpart of reference layers/relu.py:11-20.
"""

import jax
from flax import nnx


class ReLU(nnx.Module):

    def __init__(self, inplace: bool = False):
        self.inplace = inplace  # API parity; meaningless in JAX

    def __call__(self, input):
        if isinstance(input, tuple):
            x, _ = input
            return jax.nn.relu(x), 0
        return jax.nn.relu(input)
