"""Post-training INT8 quantization API (mirrors reference
``bayesian_torch.quantization.prepare/convert``,
quantization/__init__.py:1-2)."""

from bayesian_torch_tpu.quantization.quantize import (  # noqa: F401
    convert,
    enable_prepare,
    prepare,
)
from bayesian_torch_tpu.quantization.observers import (  # noqa: F401
    HistogramObserver,
    MinMaxObserver,
    PerChannelMinMaxObserver,
    QConfig,
)
from bayesian_torch_tpu.quantization.serving import (  # noqa: F401,E402
    freeze_quantized_draws,
    unfreeze_quantized_draws,
)
