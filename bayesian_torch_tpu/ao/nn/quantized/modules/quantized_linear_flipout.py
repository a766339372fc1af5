"""Legacy ao/nn/quantized/modules semantics (reference keeps older
snapshots of the quantized layers here; the diffs that matter:
default_scale=0.1 vs 0.2, int8-quantized bias, and no quant_dict
calibrated path — reference
ao/nn/quantized/modules/quantize_linear_variational.py:83,133).

These are REAL subclasses pinning ``legacy_ao = True`` on the shared
quantized base, not aliases: ``quantize()`` round-trips the bias
through int8 and ``forward`` always takes the default-scale path with
default_scale=0.1.
"""

from bayesian_torch_tpu.layers.flipout_layers.quantized_linear_flipout import (  # noqa: F401
    QuantizedLinearFlipout as _QuantizedLinearFlipout,
)

__all__ = ["QuantizedLinearFlipout"]


class QuantizedLinearFlipout(_QuantizedLinearFlipout):
    legacy_ao = True
