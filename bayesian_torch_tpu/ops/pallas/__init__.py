"""Pallas (Mosaic) TPU kernels — the framework's "native" layer.

The reference delegates its hot loops to PyTorch's C++/CUDA/oneDNN ops
(SURVEY.md §2.4); the TPU equivalents live here:

- ``sampled_weights.py``: K1 — fused Gaussian weight sampling with the
  on-chip hardware PRNG (mu + softplus(rho) * eps in one VMEM pass,
  Box-Muller normals from pltpu.prng_random_bits, bf16 output, and a
  regenerate-eps custom VJP that never stores eps in HBM).
"""

from bayesian_torch_tpu.ops.pallas.sampled_weights import (  # noqa: F401
    sample_gaussian_pallas,
)
