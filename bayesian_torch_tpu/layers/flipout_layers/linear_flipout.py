"""Linear layer with the Flipout MC estimator (Wen et al., 2018).

TPU-native counterpart of the reference ``LinearFlipout``
(bayesian_torch/layers/flipout_layers/linear_flipout.py:49-197). Same
parameter surface and math: mean GEMM carries mu_weight and mu_bias;
the perturbation GEMM carries sigma*eps with per-call Rademacher input/
output sign flips, and only sigma_b*eps_b for the bias
(linear_flipout.py:160-173).
"""

from __future__ import annotations

from typing import Optional

from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import (
    BaseVariationalLayer,
    default_rngs,
)
from bayesian_torch_tpu.ops import linear as linear_ops
from bayesian_torch_tpu.ops.kl import gaussian_kl_from_rho

__all__ = ["LinearFlipout"]


class LinearFlipout(BaseVariationalLayer):

    def __init__(self,
                 in_features: int,
                 out_features: int,
                 prior_mean: float = 0,
                 prior_variance: float = 1,
                 posterior_mu_init: float = 0,
                 posterior_rho_init: float = -3.0,
                 bias: bool = True,
                 *,
                 rngs: Optional[nnx.Rngs] = None,
                 compute_dtype=None,
                 impl: str = "xla"):
        super().__init__()
        if rngs is None:
            rngs = default_rngs()

        self.in_features = in_features
        self.out_features = out_features
        self.prior_mean = prior_mean
        self.prior_variance = prior_variance
        self.posterior_mu_init = posterior_mu_init
        self.posterior_rho_init = posterior_rho_init
        self.bias = bias
        self.compute_dtype = compute_dtype
        self.impl = impl
        self.rngs = rngs

        self.mu_weight, self.rho_weight = self._init_posterior(
            rngs, (out_features, in_features),
            posterior_mu_init, posterior_rho_init)
        self.prior_weight_mu, self.prior_weight_sigma = self._init_prior(
            prior_mean, prior_variance)

        if bias:
            self.mu_bias, self.rho_bias = self._init_posterior(
                rngs, (out_features,),
                posterior_mu_init, posterior_rho_init)
            self.prior_bias_mu, self.prior_bias_sigma = self._init_prior(
                prior_mean, prior_variance)
        else:
            self.mu_bias = None
            self.rho_bias = None
            self.prior_bias_mu = None
            self.prior_bias_sigma = None

    def kl_loss(self):
        kl = gaussian_kl_from_rho(self.mu_weight[...], self.rho_weight[...],
                         self.prior_weight_mu[...],
                         self.prior_weight_sigma[...])
        if self.mu_bias is not None:
            kl = kl + gaussian_kl_from_rho(self.mu_bias[...], self.rho_bias[...],
                                  self.prior_bias_mu[...],
                                  self.prior_bias_sigma[...])
        return kl

    def prepare(self, qconfig=None):
        """Insert PTQ calibration observers (reference
        linear_flipout.py:114-120: 4 qint8 + 8 quint8)."""
        self._make_observers(4, 8, qconfig)

    def _observed_forward(self, x):
        """Calibration forward with intermediates observed
        (reference linear_flipout.py:145-192)."""
        import jax
        from bayesian_torch_tpu.ops.linear import _linear
        from bayesian_torch_tpu.ops.sampling import sigma_from_rho

        sigma_weight = sigma_from_rho(self.rho_weight[...])
        eps = jax.random.normal(self.rngs.noise(), self.mu_weight.shape)
        delta_weight = sigma_weight * eps
        pert_bias = None
        mu_b = None
        if self.mu_bias is not None:
            mu_b = self.mu_bias[...]
            sigma_b = sigma_from_rho(self.rho_bias[...])
            eps_b = jax.random.normal(self.rngs.noise(), self.mu_bias.shape)
            pert_bias = sigma_b * eps_b
        outputs = _linear(x, self.mu_weight[...], mu_b)
        sign_input = jax.random.rademacher(self.rngs.noise(), x.shape,
                                           x.dtype)
        sign_output = jax.random.rademacher(self.rngs.noise(),
                                            outputs.shape, outputs.dtype)
        x_tmp = x * sign_input
        pert_tmp = _linear(x_tmp, delta_weight, pert_bias)
        perturbed = pert_tmp * sign_output
        out = outputs + perturbed

        for ob, v in zip(self.quint_quant,
                         (x, outputs, sign_input, sign_output, x_tmp,
                          pert_tmp, perturbed, out)):
            ob(v)
        for ob, v in zip(self.qint_quant,
                         (sigma_weight, self.mu_weight[...], eps,
                          delta_weight)):
            ob(v)
        return out

    def __call__(self, x, return_kl: bool = True, *,
                 eps_w=None, eps_b=None, sign_in=None, sign_out=None):
        if self.dnn_to_bnn_flag:
            return_kl = False

        if self.quant_prepare:
            out = self._observed_forward(x)
            if return_kl:
                return out, (self.kl_loss() if self.compute_kl else 0.0)
            return out

        if getattr(self, "_presampled_w", None) is not None:
            # fused-sampler path: _presampled_w is delta_w = sigma*eps
            import jax as _jax
            from bayesian_torch_tpu.ops.linear import _linear
            mu_b = self.mu_bias[...] if self.mu_bias is not None else None
            mean_out = _linear(x, self.mu_weight[...], mu_b,
                               self.compute_dtype)
            b = (self._presampled_b[...]
                 if getattr(self, "_presampled_b", None) is not None
                 else None)
            k_si, k_so = _jax.random.split(self.rngs.noise())
            s_in = _jax.random.rademacher(k_si, x.shape, x.dtype)
            s_out = _jax.random.rademacher(k_so, mean_out.shape,
                                           mean_out.dtype)
            pert = _linear(x * s_in, self._presampled_w[...], b,
                           self.compute_dtype)
            out = mean_out + pert * s_out
            if return_kl:
                return out, (self.kl_loss() if self.compute_kl else 0.0)
            return out

        mu_b = self.mu_bias[...] if self.mu_bias is not None else None
        rho_b = self.rho_bias[...] if self.rho_bias is not None else None

        # scan-emission eps presample (parallel.mc): raw draws made
        # outside the loop; delta build stays in the fused in-body path
        if eps_w is None and getattr(self, "_presampled_eps",
                                     None) is not None:
            eps_w = self._presampled_eps[...]
        if eps_b is None and getattr(self, "_presampled_eps_b",
                                     None) is not None:
            eps_b = self._presampled_eps_b[...]

        S = getattr(self, "_mc_structured", None)
        if S:
            out = linear_ops.flipout_linear_structured(
                x, self.rngs.noise(), S,
                self.mu_weight[...], self.rho_weight[...], mu_b, rho_b,
                eps_w=eps_w, eps_b=eps_b, sign_in=sign_in,
                sign_out=sign_out, compute_dtype=self.compute_dtype)
            if return_kl:
                return out, (self.kl_loss() if self.compute_kl else 0.0)
            return out

        out = linear_ops.flipout_linear(
            x, self.rngs.noise(),
            self.mu_weight[...], self.rho_weight[...], mu_b, rho_b,
            eps_w=eps_w, eps_b=eps_b, sign_in=sign_in, sign_out=sign_out,
            compute_dtype=self.compute_dtype)

        if return_kl:
            return out, (self.kl_loss() if self.compute_kl else 0.0)
        return out

    def __repr__(self):
        return "LinearFlipout()"
