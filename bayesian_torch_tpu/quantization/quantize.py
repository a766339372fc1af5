"""Public alias of the ao quantization API (mirrors reference
bayesian_torch/quantization/quantize.py)."""

from bayesian_torch_tpu.ao.quantization.quantize import (  # noqa: F401
    convert,
    enable_prepare,
    prepare,
)
