"""C18: legacy ao/nn/quantized/modules semantics (REAL subclasses, not
aliases): default_scale=0.1, int8-quantized bias, no quant_dict path.

Parity oracle: the reference's own legacy classes under
/root/reference/bayesian_torch/ao/nn/quantized/modules/ with sigma
forced ~0 (rho=-100), which makes both sides deterministic.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from tests import reference_oracle as oracle


def _build_ours(cls, mu_w, rho_w, mu_b, rho_b):
    from bayesian_torch_tpu.layers import LinearReparameterization

    out_f, in_f = mu_w.shape
    ql = cls(in_f, out_f, rngs=nnx.Rngs(params=0, noise=1))
    src = LinearReparameterization(in_f, out_f,
                                   rngs=nnx.Rngs(params=0, noise=1))
    src.mu_weight[...] = jnp.asarray(mu_w)
    src.rho_weight[...] = jnp.asarray(rho_w)
    src.mu_bias[...] = jnp.asarray(mu_b)
    src.rho_bias[...] = jnp.asarray(rho_b)
    ql.mu_weight = src.mu_weight
    ql.rho_weight = src.rho_weight
    ql.mu_bias = src.mu_bias
    ql.rho_bias = src.rho_bias
    ql.quantize()
    return ql


def _import_ref_legacy_linear():
    """Import the reference's legacy class. The reference module itself
    is UNIMPORTABLE as shipped (``from ..base_variational_layer import``
    resolves to bayesian_torch.ao.nn.quantized.base_variational_layer,
    which does not exist) — a reference bug; shim the two module paths
    it expects before importing."""
    import sys

    oracle.import_reference()
    from bayesian_torch.layers import base_variational_layer as bvl
    from bayesian_torch.layers.variational_layers import (
        linear_variational as lv)
    sys.modules.setdefault(
        "bayesian_torch.ao.nn.quantized.base_variational_layer", bvl)
    sys.modules.setdefault(
        "bayesian_torch.ao.nn.quantized.modules.linear_variational", lv)
    from bayesian_torch.ao.nn.quantized.modules.quantize_linear_variational \
        import QuantizedLinearReparameterization
    return QuantizedLinearReparameterization


def test_legacy_flag_and_default_scale():
    from bayesian_torch_tpu.ao.nn.quantized.modules import (
        QuantizedConv2dFlipout, QuantizedLinearReparameterization)
    from bayesian_torch_tpu.layers import (
        QuantizedLinearReparameterization as NewQL)

    assert QuantizedLinearReparameterization.legacy_ao is True
    assert QuantizedConv2dFlipout.legacy_ao is True
    assert NewQL.legacy_ao is False
    # subclass relationship: the ao class IS the canonical class with
    # the legacy pin (no duplicated implementation)
    assert issubclass(QuantizedLinearReparameterization, NewQL)


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_legacy_linear_matches_reference_legacy_module():
    import torch

    RefLegacyQL = _import_ref_legacy_linear()

    from bayesian_torch_tpu.ao.nn.quantized.modules import (
        QuantizedLinearReparameterization)

    rs = np.random.RandomState(0)
    mu_w = (rs.randn(6, 12) * 0.4).astype(np.float32)
    rho_w = np.full((6, 12), -100.0, np.float32)  # sigma ~ 0
    mu_b = rs.randn(6).astype(np.float32)
    rho_b = np.full(6, -100.0, np.float32)
    x = rs.randn(5, 12).astype(np.float32)

    ours = _build_ours(QuantizedLinearReparameterization,
                       mu_w, rho_w, mu_b, rho_b)
    out_ours, kl = ours(jnp.asarray(x))
    assert kl == 0

    ref = RefLegacyQL(12, 6)
    with torch.no_grad():
        ref.mu_weight.data.copy_(torch.from_numpy(mu_w))
        ref.rho_weight.data.copy_(torch.from_numpy(rho_w))
        ref.mu_bias.data.copy_(torch.from_numpy(mu_b))
        ref.rho_bias.data.copy_(torch.from_numpy(rho_b))
    ref.quantize()
    with torch.no_grad():
        out_ref, _ = ref(torch.from_numpy(x))

    # default_scale=0.1 output grid: agree within one quantum
    np.testing.assert_allclose(np.asarray(out_ours),
                               out_ref.numpy(), atol=0.1 + 1e-6)


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_legacy_bias_int8_roundtrip_matches_reference():
    """quantize() must store the bias int8-rounded exactly as the
    reference legacy module's quantized bias dequantizes."""
    import torch

    RefLegacyQL = _import_ref_legacy_linear()

    from bayesian_torch_tpu.ao.nn.quantized.modules import (
        QuantizedLinearReparameterization)

    rs = np.random.RandomState(3)
    mu_w = (rs.randn(4, 8) * 0.3).astype(np.float32)
    rho_w = (rs.randn(4, 8) - 3).astype(np.float32)
    mu_b = (rs.randn(4) * 2).astype(np.float32)
    rho_b = (rs.randn(4) - 3).astype(np.float32)

    ours = _build_ours(QuantizedLinearReparameterization,
                       mu_w, rho_w, mu_b, rho_b)

    ref = RefLegacyQL(8, 4)
    with torch.no_grad():
        ref.mu_weight.data.copy_(torch.from_numpy(mu_w))
        ref.rho_weight.data.copy_(torch.from_numpy(rho_w))
        ref.mu_bias.data.copy_(torch.from_numpy(mu_b))
        ref.rho_bias.data.copy_(torch.from_numpy(rho_b))
    ref.quantize()

    np.testing.assert_allclose(
        np.asarray(ours.quantized_mu_bias[...]),
        ref.quantized_mu_bias.dequantize().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours.quantized_sigma_bias[...]),
        ref.quantized_sigma_bias.dequantize().numpy(), rtol=1e-5,
        atol=1e-6)
    # weights quantized identically (both use the 2*max/255 rule)
    np.testing.assert_array_equal(
        np.asarray(ours.quantized_mu_weight[...]),
        ref.quantized_mu_weight.int_repr().numpy())
