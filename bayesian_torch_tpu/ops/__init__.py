"""Compute ops: XLA reference implementations + fused Pallas TPU kernels.

Layout:
- ``kl.py``            closed-form Gaussian KL (K3 of SURVEY.md §2.4)
- ``sampling.py``      Gaussian / Rademacher weight-noise draws
- ``linear.py``        sampled linear + flipout linear (K1/K2, XLA path)
- ``conv.py``          sampled conv/conv-transpose (K1, XLA path)
- ``pallas/``          fused TPU kernels (K1/K2/K4)
"""

from bayesian_torch_tpu.ops.kl import gaussian_kl  # noqa: F401
from bayesian_torch_tpu.ops.sampling import (  # noqa: F401
    sample_gaussian_weight,
    sigma_from_rho,
)
