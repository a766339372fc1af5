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

from bayesian_torch_tpu.layers.variational_layers.quantize_conv_variational import (  # noqa: F401
    QuantizedConv1dReparameterization as _QuantizedConv1dReparameterization,
    QuantizedConv2dReparameterization as _QuantizedConv2dReparameterization,
    QuantizedConv3dReparameterization as _QuantizedConv3dReparameterization,
    QuantizedConvTranspose1dReparameterization as _QuantizedConvTranspose1dReparameterization,
    QuantizedConvTranspose2dReparameterization as _QuantizedConvTranspose2dReparameterization,
    QuantizedConvTranspose3dReparameterization as _QuantizedConvTranspose3dReparameterization,
)

__all__ = ["QuantizedConv1dReparameterization", "QuantizedConv2dReparameterization", "QuantizedConv3dReparameterization", "QuantizedConvTranspose1dReparameterization", "QuantizedConvTranspose2dReparameterization", "QuantizedConvTranspose3dReparameterization"]


class QuantizedConv1dReparameterization(_QuantizedConv1dReparameterization):
    legacy_ao = True


class QuantizedConv2dReparameterization(_QuantizedConv2dReparameterization):
    legacy_ao = True


class QuantizedConv3dReparameterization(_QuantizedConv3dReparameterization):
    legacy_ao = True


class QuantizedConvTranspose1dReparameterization(_QuantizedConvTranspose1dReparameterization):
    legacy_ao = True


class QuantizedConvTranspose2dReparameterization(_QuantizedConvTranspose2dReparameterization):
    legacy_ao = True


class QuantizedConvTranspose3dReparameterization(_QuantizedConvTranspose3dReparameterization):
    legacy_ao = True
