"""LinearReparameterization / LinearFlipout numerics and semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bayesian_torch_tpu.layers import LinearFlipout, LinearReparameterization
from tests import reference_oracle as oracle


def _layer(cls, din=6, dout=4, **kw):
    return cls(din, dout, rngs=nnx.Rngs(params=0, noise=1), **kw)


class TestLinearReparameterization:
    def test_returns_out_and_kl(self):
        m = _layer(LinearReparameterization)
        x = jnp.ones((3, 6))
        out, kl = m(x)
        assert out.shape == (3, 4)
        assert kl.shape == ()
        assert float(kl) > 0

    def test_stochastic_between_calls(self):
        m = _layer(LinearReparameterization)
        x = jnp.ones((3, 6))
        o1, _ = m(x)
        o2, _ = m(x)
        assert np.any(np.asarray(o1) != np.asarray(o2))

    def test_injected_eps_matches_manual_math(self):
        m = _layer(LinearReparameterization)
        x = np.random.RandomState(0).randn(5, 6).astype(np.float32)
        eps_w = np.random.RandomState(1).randn(4, 6).astype(np.float32)
        eps_b = np.random.RandomState(2).randn(4).astype(np.float32)
        out, _ = m(jnp.asarray(x), eps_w=jnp.asarray(eps_w),
                   eps_b=jnp.asarray(eps_b))

        mu_w = np.asarray(m.mu_weight[...])
        rho_w = np.asarray(m.rho_weight[...])
        mu_b = np.asarray(m.mu_bias[...])
        rho_b = np.asarray(m.rho_bias[...])
        w = mu_w + np.log1p(np.exp(rho_w)) * eps_w
        b = mu_b + np.log1p(np.exp(rho_b)) * eps_b
        expected = x @ w.T + b
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                                   atol=1e-5)

    def test_dnn_to_bnn_flag_returns_bare_output(self):
        m = _layer(LinearReparameterization)
        m.dnn_to_bnn_flag = True
        out = m(jnp.ones((2, 6)))
        assert isinstance(out, jax.Array)
        assert out.shape == (2, 4)

    def test_no_bias(self):
        m = _layer(LinearReparameterization, bias=False)
        out, kl = m(jnp.ones((2, 6)))
        assert out.shape == (2, 4)
        assert m.mu_bias is None

    def test_sample_moments(self):
        # mean of MC outputs ≈ mu-forward; std ≈ sqrt(sum sigma^2 x^2)
        m = _layer(LinearReparameterization, posterior_rho_init=-2.0)
        x = jnp.ones((1, 6))

        @nnx.jit
        def draw(m, x):
            out, _ = m(x)
            return out

        outs = np.stack([np.asarray(draw(m, x)) for _ in range(3000)])
        mu_fwd = np.asarray(x) @ np.asarray(m.mu_weight[...]).T + np.asarray(
            m.mu_bias[...])
        # SE of the MC mean is ~sigma_total/sqrt(3000) ~ 0.006; 5-sigma gate.
        np.testing.assert_allclose(outs.mean(0), mu_fwd, atol=0.04)

        sigma_w = np.log1p(np.exp(np.asarray(m.rho_weight[...])))
        sigma_b = np.log1p(np.exp(np.asarray(m.rho_bias[...])))
        expected_var = (sigma_w ** 2).sum(1) + sigma_b ** 2
        np.testing.assert_allclose(outs.std(0).ravel(),
                                   np.sqrt(expected_var), rtol=0.1)

    @pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
    def test_fixed_eps_parity_with_reference(self):
        import torch
        oracle.import_reference()
        from bayesian_torch.layers import LinearReparameterization as RefLin

        m = _layer(LinearReparameterization)
        ref = RefLin(6, 4)
        oracle.copy_linear_params_to_torch(m, ref)

        x = np.random.RandomState(3).randn(5, 6).astype(np.float32)
        eps_w = np.random.RandomState(4).randn(4, 6).astype(np.float32)
        eps_b = np.random.RandomState(5).randn(4).astype(np.float32)

        out, kl = m(jnp.asarray(x), eps_w=jnp.asarray(eps_w),
                    eps_b=jnp.asarray(eps_b))

        # Reference draws eps by normal_() on its buffers; emulate the
        # same fixed eps by monkeypatching torch.Tensor.normal_ to leave
        # injected values in place.
        with torch.no_grad():
            ref.eps_weight.data.copy_(oracle.to_torch(eps_w))
            ref.eps_bias.data.copy_(oracle.to_torch(eps_b))
            orig = torch.Tensor.normal_
            try:
                torch.Tensor.normal_ = lambda self, *a, **k: self
                ref_out, ref_kl = ref(oracle.to_torch(x))
            finally:
                torch.Tensor.normal_ = orig
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   rtol=1e-4, atol=1e-5)
        assert float(kl) == pytest.approx(float(ref_kl), rel=1e-5)


class TestLinearFlipout:
    def test_returns_out_and_kl(self):
        m = _layer(LinearFlipout)
        out, kl = m(jnp.ones((3, 6)))
        assert out.shape == (3, 4)
        assert float(kl) > 0

    def test_mean_path_when_sigma_zero(self):
        # rho -> -inf means sigma -> 0: flipout output == mean GEMM
        m = _layer(LinearFlipout, posterior_rho_init=-100.0)
        x = np.random.RandomState(0).randn(3, 6).astype(np.float32)
        out, _ = m(jnp.asarray(x))
        expected = x @ np.asarray(m.mu_weight[...]).T + np.asarray(
            m.mu_bias[...])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                                   atol=1e-5)

    def test_injected_noise_matches_manual_math(self):
        m = _layer(LinearFlipout)
        rs = np.random.RandomState(7)
        x = rs.randn(5, 6).astype(np.float32)
        eps_w = rs.randn(4, 6).astype(np.float32)
        eps_b = rs.randn(4).astype(np.float32)
        sign_in = np.sign(rs.randn(5, 6)).astype(np.float32)
        sign_out = np.sign(rs.randn(5, 4)).astype(np.float32)

        out, _ = m(jnp.asarray(x), eps_w=jnp.asarray(eps_w),
                   eps_b=jnp.asarray(eps_b), sign_in=jnp.asarray(sign_in),
                   sign_out=jnp.asarray(sign_out))

        mu_w = np.asarray(m.mu_weight[...])
        sigma_w = np.log1p(np.exp(np.asarray(m.rho_weight[...])))
        mu_b = np.asarray(m.mu_bias[...])
        sigma_b = np.log1p(np.exp(np.asarray(m.rho_bias[...])))
        mean_out = x @ mu_w.T + mu_b
        pert = ((x * sign_in) @ (sigma_w * eps_w).T + sigma_b * eps_b) * sign_out
        np.testing.assert_allclose(np.asarray(out), mean_out + pert,
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
    def test_fixed_noise_parity_with_reference(self):
        import torch
        oracle.import_reference()
        from bayesian_torch.layers import LinearFlipout as RefFlip

        m = _layer(LinearFlipout)
        ref = RefFlip(6, 4)
        oracle.copy_linear_params_to_torch(m, ref)

        rs = np.random.RandomState(11)
        x = rs.randn(5, 6).astype(np.float32)
        eps_w = rs.randn(4, 6).astype(np.float32)
        eps_b = rs.randn(4).astype(np.float32)
        sign_in = np.sign(rs.randn(5, 6)).astype(np.float32)
        sign_out = np.sign(rs.randn(5, 4)).astype(np.float32)

        out, kl = m(jnp.asarray(x), eps_w=jnp.asarray(eps_w),
                    eps_b=jnp.asarray(eps_b), sign_in=jnp.asarray(sign_in),
                    sign_out=jnp.asarray(sign_out))

        # Freeze the reference's RNG so its eps buffers keep injected
        # values and its uniform_().sign() produces our injected signs.
        with torch.no_grad():
            ref.eps_weight.data.copy_(oracle.to_torch(eps_w))
            ref.eps_bias.data.copy_(oracle.to_torch(eps_b))
            sign_queue = [oracle.to_torch(sign_in), oracle.to_torch(sign_out)]
            orig_normal = torch.Tensor.normal_
            orig_uniform = torch.Tensor.uniform_
            try:
                torch.Tensor.normal_ = lambda self, *a, **k: self
                torch.Tensor.uniform_ = (
                    lambda self, *a, **k: self.copy_(sign_queue.pop(0)))
                ref_out, ref_kl = ref(oracle.to_torch(x))
            finally:
                torch.Tensor.normal_ = orig_normal
                torch.Tensor.uniform_ = orig_uniform
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   rtol=1e-4, atol=1e-5)
        assert float(kl) == pytest.approx(float(ref_kl), rel=1e-5)
