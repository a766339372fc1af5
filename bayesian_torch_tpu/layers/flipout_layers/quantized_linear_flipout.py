"""INT8 quantized Linear (flipout).

Counterpart of reference
layers/flipout_layers/quantized_linear_flipout.py:47-261. The
reference's pre-sampled Rademacher sign pools (:196-219) are an
artifact of torch's host-side RNG cost; on TPU fresh signs from the
hardware-backed PRNG are cheaper than the pool's gather, so signs are
drawn per call (distributionally identical).
"""

from bayesian_torch_tpu.layers.quantized_base import _QuantizedLinearBase

__all__ = ["QuantizedLinearFlipout"]


class QuantizedLinearFlipout(_QuantizedLinearBase):
    estimator = "flipout"
