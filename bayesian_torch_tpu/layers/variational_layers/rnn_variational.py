"""LSTM with the reparameterization estimator.

Counterpart of reference rnn_variational.py:46-153; see
layers/rnn_base.py for the lax.scan design and semantics notes.
"""

from bayesian_torch_tpu.layers.rnn_base import _BaseLSTMLayer

__all__ = ["LSTMReparameterization"]


class LSTMReparameterization(_BaseLSTMLayer):
    estimator = "reparameterization"
