"""Torch-reference oracle for golden-value parity tests.

Imports the mounted IntelLabs/bayesian-torch (read-only, CPU torch) and
provides helpers to copy parameters between our nnx layers and the
reference torch layers so deterministic quantities (KL, mu-only forwards,
fixed-eps forwards) can be compared exactly.

The reference is used strictly as a numeric oracle; no code is copied.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "bayesian_torch"))


def import_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import bayesian_torch  # noqa: F401
    return bayesian_torch


def to_torch(x):
    import torch
    return torch.from_numpy(np.asarray(x).copy())


def copy_linear_params_to_torch(ours, ref_layer):
    """Copy mu/rho weight+bias from our nnx layer into a reference torch
    linear-style layer (works for LinearReparameterization/LinearFlipout)."""
    import torch
    with torch.no_grad():
        ref_layer.mu_weight.data.copy_(to_torch(ours.mu_weight[...]))
        ref_layer.rho_weight.data.copy_(to_torch(ours.rho_weight[...]))
        if ours.mu_bias is not None:
            ref_layer.mu_bias.data.copy_(to_torch(ours.mu_bias[...]))
            ref_layer.rho_bias.data.copy_(to_torch(ours.rho_bias[...]))


def copy_conv_params_to_torch(ours, ref_layer):
    import torch
    with torch.no_grad():
        ref_layer.mu_kernel.data.copy_(to_torch(ours.mu_kernel[...]))
        ref_layer.rho_kernel.data.copy_(to_torch(ours.rho_kernel[...]))
        if ours.mu_bias is not None:
            ref_layer.mu_bias.data.copy_(to_torch(ours.mu_bias[...]))
            ref_layer.rho_bias.data.copy_(to_torch(ours.rho_bias[...]))
