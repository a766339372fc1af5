"""bayesian_torch_tpu: a TPU-native Bayesian deep-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
IntelLabs/bayesian-torch (reference: /root/reference/bayesian_torch):

- Mean-field Gaussian variational layers (Reparameterization + Flipout
  Monte-Carlo estimators) for Linear / Conv1-3d / ConvTranspose1-3d / LSTM,
  built on ``flax.nnx`` modules with explicit PRNG streams instead of
  mutable ``eps`` buffers.
- Model surgery: ``dnn_to_bnn`` / ``get_kl_loss`` / MOPED empirical-Bayes
  init / ``bnn_to_qbnn`` INT8 conversion.
- Post-training INT8 quantization (``bayesian_torch_tpu.quantization.
  prepare/convert``).
- Uncertainty losses and metrics (AvULoss, AUAvULoss, EaULoss, EaCLoss,
  predictive entropy, mutual information).
- A model zoo (SCNN, CIFAR ResNet-20..110, ImageNet ResNet-18..152) in
  deterministic / reparameterization / flipout / quantized variants.
- TPU-first execution: fused Pallas sample+GEMM kernels, vmapped
  Monte-Carlo sample axis, and ``jax.sharding`` meshes for multi-chip
  data/MC parallelism.

The public API intentionally mirrors the reference (same class names,
constructor arguments, and the ``(output, kl)`` forward convention) so users
of bayesian-torch can switch with minimal changes.
"""

from bayesian_torch_tpu.quantization import prepare, convert  # noqa: F401

__version__ = "0.1.0"
