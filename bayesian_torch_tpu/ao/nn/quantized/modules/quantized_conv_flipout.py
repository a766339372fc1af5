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

from bayesian_torch_tpu.layers.flipout_layers.quantized_conv_flipout import (  # noqa: F401
    QuantizedConv1dFlipout as _QuantizedConv1dFlipout,
    QuantizedConv2dFlipout as _QuantizedConv2dFlipout,
    QuantizedConv3dFlipout as _QuantizedConv3dFlipout,
    QuantizedConvTranspose1dFlipout as _QuantizedConvTranspose1dFlipout,
    QuantizedConvTranspose2dFlipout as _QuantizedConvTranspose2dFlipout,
    QuantizedConvTranspose3dFlipout as _QuantizedConvTranspose3dFlipout,
)

__all__ = ["QuantizedConv1dFlipout", "QuantizedConv2dFlipout", "QuantizedConv3dFlipout", "QuantizedConvTranspose1dFlipout", "QuantizedConvTranspose2dFlipout", "QuantizedConvTranspose3dFlipout"]


class QuantizedConv1dFlipout(_QuantizedConv1dFlipout):
    legacy_ao = True


class QuantizedConv2dFlipout(_QuantizedConv2dFlipout):
    legacy_ao = True


class QuantizedConv3dFlipout(_QuantizedConv3dFlipout):
    legacy_ao = True


class QuantizedConvTranspose1dFlipout(_QuantizedConvTranspose1dFlipout):
    legacy_ao = True


class QuantizedConvTranspose2dFlipout(_QuantizedConvTranspose2dFlipout):
    legacy_ao = True


class QuantizedConvTranspose3dFlipout(_QuantizedConvTranspose3dFlipout):
    legacy_ao = True
