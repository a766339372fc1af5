"""Bayesian SCNN (flipout), MNIST.

Counterpart of reference models/flipout/simple_cnn.py:16-74.
"""

from bayesian_torch_tpu.models._scnn import _SCNN

__all__ = ["SCNN"]


class SCNN(_SCNN):
    estimator = "Flipout"
