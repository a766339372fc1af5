"""LSTM with the Flipout estimator.

Counterpart of reference rnn_flipout.py:46-153; see layers/rnn_base.py.
"""

from bayesian_torch_tpu.layers.rnn_base import _BaseLSTMLayer

__all__ = ["LSTMFlipout"]


class LSTMFlipout(_BaseLSTMLayer):
    estimator = "flipout"
