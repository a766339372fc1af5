from bayesian_torch_tpu.ao.quantization.quantize import (  # noqa: F401
    convert,
    enable_prepare,
    prepare,
)
