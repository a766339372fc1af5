"""Deterministic SCNN, MNIST (MOPED source / dnn_to_bnn input).

Counterpart of reference models/deterministic/simple_cnn.py:8-30.
"""

from bayesian_torch_tpu.models._scnn import _SCNN

__all__ = ["SCNN"]


class SCNN(_SCNN):
    estimator = None
