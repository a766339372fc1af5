"""Bayesian SCNN (reparameterization), MNIST.

Counterpart of reference models/bayesian/simple_cnn_variational.py:16-78.
"""

from bayesian_torch_tpu.models._scnn import _SCNN

__all__ = ["SCNN"]


class SCNN(_SCNN):
    estimator = "Reparameterization"
