"""INT8 quantized Bayesian ImageNet ResNets (flipout).

Counterpart of reference
models/bayesian/quantized_resnet_flipout_large.py; see the
reparameterization twin for the factory design.
"""

from __future__ import annotations

from typing import Callable, Optional

from bayesian_torch_tpu.models._large_resnet import make_factories
from bayesian_torch_tpu.quantization import convert, prepare

__all__ = ["qresnet18", "qresnet34", "qresnet50", "qresnet101",
           "qresnet152"]

_float_factories = make_factories("Flipout")


def _make_q(name):
    float_factory = _float_factories[name]

    def factory(num_classes: int = 1000, *, rngs=None,
                calibrate: Optional[Callable] = None,
                fuse_conv_bn: bool = False,
                quantize_activations: bool = True, **kwargs):
        model = float_factory(num_classes=num_classes, rngs=rngs, **kwargs)
        model.eval()
        prepare(model)
        if calibrate is not None:
            calibrate(model)
        convert(model, fuse_conv_bn=fuse_conv_bn,
                quantize_activations=quantize_activations)
        return model

    factory.__name__ = "q" + name
    return factory


qresnet18 = _make_q("resnet18")
qresnet34 = _make_q("resnet34")
qresnet50 = _make_q("resnet50")
qresnet101 = _make_q("resnet101")
qresnet152 = _make_q("resnet152")
