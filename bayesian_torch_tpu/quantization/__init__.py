"""Post-training INT8 quantization API (mirrors reference
``bayesian_torch.quantization.prepare/convert``,
ao/quantization/quantize.py:154-172).

Implemented in later build stages; placeholder signatures keep the
top-level API importable from day one.
"""


def prepare(model, *args, **kwargs):
    raise NotImplementedError(
        "bayesian_torch_tpu.quantization.prepare is scheduled for the "
        "quantization build stage (SURVEY.md §7 step 8).")


def convert(model, *args, **kwargs):
    raise NotImplementedError(
        "bayesian_torch_tpu.quantization.convert is scheduled for the "
        "quantization build stage (SURVEY.md §7 step 8).")
