"""KL divergence numerics: closed form, reduction semantics, torch parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_torch_tpu.ops.kl import gaussian_kl
from tests import reference_oracle as oracle


def test_kl_zero_when_posterior_equals_prior():
    mu = jnp.zeros((4, 5))
    sigma = jnp.ones((4, 5))
    assert float(gaussian_kl(mu, sigma, 0.0, 1.0)) == pytest.approx(0.0, abs=1e-7)


def test_kl_closed_form_scalar():
    # KL(N(1, 0.5^2) || N(0,1)) = log(1/0.5) + (0.25 + 1)/2 - 0.5
    expected = np.log(2.0) + 1.25 / 2.0 - 0.5
    got = float(gaussian_kl(jnp.array([[1.0]]), jnp.array([[0.5]]), 0.0, 1.0))
    assert got == pytest.approx(expected, rel=1e-6)


def test_kl_mean_reduction_not_sum():
    mu = jnp.full((10,), 1.0)
    sigma = jnp.full((10,), 0.5)
    one = gaussian_kl(mu[:1], sigma[:1], 0.0, 1.0)
    ten = gaussian_kl(mu, sigma, 0.0, 1.0)
    assert float(one) == pytest.approx(float(ten), rel=1e-6)


@pytest.mark.skipif(not oracle.reference_available(), reason="no reference")
def test_kl_matches_reference_layer():
    import jax
    from bayesian_torch_tpu.layers import LinearReparameterization

    oracle.import_reference()
    from bayesian_torch.layers import LinearReparameterization as RefLinear

    ours = LinearReparameterization(7, 11, prior_mean=0.3, prior_variance=1.7,
                                    posterior_mu_init=0.1,
                                    posterior_rho_init=-2.0)
    ref = RefLinear(7, 11, prior_mean=0.3, prior_variance=1.7,
                    posterior_mu_init=0.1, posterior_rho_init=-2.0)
    oracle.copy_linear_params_to_torch(ours, ref)

    ref_kl = float(ref.kl_loss().detach().numpy())
    our_kl = float(ours.kl_loss())
    assert our_kl == pytest.approx(ref_kl, rel=1e-5, abs=1e-6)

    # and under jit
    import flax.nnx as nnx
    our_kl_jit = float(nnx.jit(lambda m: m.kl_loss())(ours))
    assert our_kl_jit == pytest.approx(ref_kl, rel=1e-5, abs=1e-6)
