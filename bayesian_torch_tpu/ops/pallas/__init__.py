"""Pallas (Mosaic) TPU kernels — the framework's "native" layer.

The reference delegates its hot loops to PyTorch's C++/CUDA/oneDNN ops
(SURVEY.md §2.4); the TPU equivalents live here:

- ``sampled_weights.py``: K1 — fused Gaussian weight sampling with the
  on-chip hardware PRNG (mu + softplus(rho) * eps in one VMEM pass,
  Box-Muller normals, bf16 output, regenerate-eps custom VJP), in
  single-draw and batched-S (read-mu-once, stream S draws) variants.
"""

from bayesian_torch_tpu.ops.pallas.sampled_matmul import (  # noqa: F401
    sampled_matmul_pallas,
)
from bayesian_torch_tpu.ops.pallas.sampled_weights import (  # noqa: F401
    sample_gaussian_pallas,
    sample_gaussian_pallas_batch,
    sample_scaled_normals_batch,
)
