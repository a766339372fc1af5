"""Public import-path parity with the reference.

The reference's subpackage __init__ files star-import their quantized
modules (bayesian_torch/layers/variational_layers/__init__.py:4-5,
flipout_layers/__init__.py:4-5), so a reference user can import the
Quantized* classes, BaseVariationalLayer_, and the observer/QConfig
names from those subpackages directly. Pin that every such import path
works here too, so `s/bayesian_torch/bayesian_torch_tpu/` ports 1:1.
"""

import numpy as np
import pytest


def test_variational_layers_namespace():
    from bayesian_torch_tpu.layers.variational_layers import (  # noqa: F401
        BaseVariationalLayer_,
        Conv1dReparameterization,
        Conv2dReparameterization,
        Conv3dReparameterization,
        ConvTranspose1dReparameterization,
        ConvTranspose2dReparameterization,
        ConvTranspose3dReparameterization,
        HistogramObserver,
        LinearReparameterization,
        LSTMReparameterization,
        MinMaxObserver,
        PerChannelMinMaxObserver,
        QConfig,
        QuantizedConv1dReparameterization,
        QuantizedConv2dReparameterization,
        QuantizedConv3dReparameterization,
        QuantizedConvTranspose1dReparameterization,
        QuantizedConvTranspose2dReparameterization,
        QuantizedConvTranspose3dReparameterization,
        QuantizedLinearReparameterization,
    )


def test_flipout_layers_namespace():
    from bayesian_torch_tpu.layers.flipout_layers import (  # noqa: F401
        BaseVariationalLayer_,
        Conv1dFlipout,
        Conv2dFlipout,
        Conv3dFlipout,
        ConvTranspose1dFlipout,
        ConvTranspose2dFlipout,
        ConvTranspose3dFlipout,
        LinearFlipout,
        LSTMFlipout,
        QuantizedConv1dFlipout,
        QuantizedConv2dFlipout,
        QuantizedConv3dFlipout,
        QuantizedConvTranspose1dFlipout,
        QuantizedConvTranspose2dFlipout,
        QuantizedConvTranspose3dFlipout,
        QuantizedLinearFlipout,
    )


def test_bnn_to_qbnn_qbatchnorm_name():
    # reference bnn_to_qbnn.py:41 exposes torch.nn.quantized.BatchNorm2d
    # as QBatchNorm2d; ours answers to the same name
    from bayesian_torch_tpu.layers.batchnorm import QuantizedBatchNorm2d
    from bayesian_torch_tpu.models.bnn_to_qbnn import QBatchNorm2d

    assert QBatchNorm2d is QuantizedBatchNorm2d


def test_avuc_auc_matches_sklearn():
    # reference avuc_loss.py:47 exposes sklearn's auc from the module;
    # ours is jnp-native with identical trapezoid-with-direction math
    from bayesian_torch_tpu.utils.avuc_loss import auc

    sklearn = pytest.importorskip("sklearn.metrics")
    x = np.array([0.0, 0.25, 0.5, 1.0])
    y = np.array([1.0, 0.8, 0.9, 0.2])
    assert float(auc(x, y)) == pytest.approx(sklearn.auc(x, y), abs=1e-6)
    # decreasing-x direction handling matches sklearn's
    assert float(auc(x[::-1].copy(), y[::-1].copy())) == pytest.approx(
        sklearn.auc(x[::-1], y[::-1]), abs=1e-6)


def test_same_name_same_class_across_paths():
    # top-level layers namespace and the subpackage expose the SAME
    # class objects (no duplicate definitions)
    import bayesian_torch_tpu.layers as L
    import bayesian_torch_tpu.layers.flipout_layers as FL
    import bayesian_torch_tpu.layers.variational_layers as VL

    for name in ("LinearReparameterization", "Conv2dReparameterization",
                 "QuantizedConv2dReparameterization"):
        assert getattr(L, name) is getattr(VL, name)
    for name in ("LinearFlipout", "Conv2dFlipout", "QuantizedLinearFlipout"):
        assert getattr(L, name) is getattr(FL, name)
