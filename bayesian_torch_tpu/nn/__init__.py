"""Deterministic torch-style modules on nnx.

The reference's deterministic model zoo and ``dnn_to_bnn`` inputs are
plain ``torch.nn`` modules; this package provides the TPU-native
equivalents with the same constructor surfaces, parameter layouts
((out, in) linear weights, OIHW conv kernels, NC* activations), and
torch default initializers, so:

- the deterministic zoo (SURVEY.md M3/M6/M9) trains like the reference,
- ``dnn_to_bnn`` surgery maps 1:1,
- MOPED can copy weights without layout gymnastics.
"""

from bayesian_torch_tpu.nn.modules import (  # noqa: F401
    AdaptiveAvgPool1d,
    AdaptiveAvgPool2d,
    AdaptiveAvgPool3d,
    AvgPool1d,
    AvgPool2d,
    AvgPool3d,
    BatchNorm1d,
    BatchNorm2d,
    BatchNorm3d,
    Conv1d,
    Conv2d,
    Conv3d,
    ConvTranspose1d,
    ConvTranspose2d,
    ConvTranspose3d,
    Dropout,
    Dropout2d,
    Flatten,
    Identity,
    Linear,
    LSTM,
    MaxPool1d,
    MaxPool2d,
    MaxPool3d,
    ReLU,
    Sequential,
)
