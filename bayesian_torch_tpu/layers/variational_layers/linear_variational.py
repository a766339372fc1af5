"""Linear layer with the reparameterization MC estimator.

TPU-native counterpart of the reference ``LinearReparameterization``
(bayesian_torch/layers/variational_layers/linear_variational.py:54-201).
Same constructor surface, parameter names/shapes (``mu_weight``/
``rho_weight`` of shape (out_features, in_features)), init distribution
(N(init, 0.1)), KL semantics (mean over weight elements + mean over bias
elements), and the ``(out, kl)`` return convention with the
``dnn_to_bnn_flag`` bare-output mode.

Differences by design (TPU-first):
- noise comes from an explicit ``nnx.Rngs`` "noise" stream, not an
  in-place eps buffer;
- KL is evaluated lazily from parameters (it does not depend on the
  sample), so MC-vmapped forwards don't recompute it per sample;
- the sampled-GEMM runs through ops.linear (XLA fused; Pallas kernel
  behind ``impl='pallas'``).
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


class LinearReparameterization(BaseVariationalLayer):

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
        """Closed-form KL of the posterior against the prior.

        Reference: linear_variational.py:144-155 (weight-mean + bias-mean).
        """
        kl = gaussian_kl_from_rho(self.mu_weight[...], self.rho_weight[...],
                         self.prior_weight_mu[...], self.prior_weight_sigma[...])
        if self.mu_bias is not None:
            kl = kl + gaussian_kl_from_rho(self.mu_bias[...], self.rho_bias[...],
                                  self.prior_bias_mu[...], self.prior_bias_sigma[...])
        return kl

    def prepare(self, qconfig=None):
        """Insert PTQ calibration observers (reference
        linear_variational.py:123-129: 5 qint8 + 2 quint8 stubs)."""
        self._make_observers(5, 2, qconfig)

    def _observed_forward(self, input):
        """Calibration forward: explicit sampling math with every
        intermediate observed (reference linear_variational.py:157-190)."""
        import jax
        from bayesian_torch_tpu.ops.sampling import sigma_from_rho

        sigma_weight = sigma_from_rho(self.rho_weight[...])
        eps = jax.random.normal(self.rngs.noise(), self.mu_weight.shape)
        tmp_result = sigma_weight * eps
        weight = self.mu_weight[...] + tmp_result
        bias = None
        if self.mu_bias is not None:
            sigma_bias = sigma_from_rho(self.rho_bias[...])
            eps_b = jax.random.normal(self.rngs.noise(), self.mu_bias.shape)
            bias = self.mu_bias[...] + sigma_bias * eps_b
        out = linear_ops._linear(input, weight, bias)

        self.quint_quant[0](input)
        self.quint_quant[1](out)
        self.qint_quant[0](sigma_weight)
        self.qint_quant[1](self.mu_weight[...])
        self.qint_quant[2](eps)
        self.qint_quant[3](tmp_result)
        self.qint_quant[4](weight)
        return out

    def __call__(self, input, return_kl: bool = True, *, eps_w=None, eps_b=None):
        if self.dnn_to_bnn_flag:
            return_kl = False

        if self.quant_prepare:
            out = self._observed_forward(input)
        elif getattr(self, "_presampled_w", None) is not None:
            # fused-sampler path: weights for this MC draw were produced
            # by the Pallas batch sampler (parallel.mc.mc_forward)
            b = (self._presampled_b[...]
                 if getattr(self, "_presampled_b", None) is not None
                 else None)
            out = linear_ops._linear(input, self._presampled_w[...], b,
                                     self.compute_dtype)
        elif (self.impl == "pallas" and eps_w is None and eps_b is None):
            # fused sample-then-GEMM: the sampled W never exists in HBM
            # (ops/pallas/sampled_matmul.py). Composes with the vmapped
            # MC axis: a custom_vmap rule dispatches one S-batched
            # kernel for all draws.
            import jax
            from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
                sampled_matmul_pallas,
            )
            kw, kb = jax.random.split(self.rngs.noise())
            lead = input.shape[:-1]
            x2 = input.reshape(-1, self.in_features)
            out = sampled_matmul_pallas(
                kw, x2, self.mu_weight[...], self.rho_weight[...],
                out_dtype=self.compute_dtype or input.dtype)
            if self.mu_bias is not None:
                from bayesian_torch_tpu.ops.sampling import (
                    sample_gaussian_weight,
                )
                b, _ = sample_gaussian_weight(kb, self.mu_bias[...],
                                              self.rho_bias[...])
                out = out + b.astype(out.dtype)
            out = out.reshape(lead + (self.out_features,))
        else:
            mu_b = self.mu_bias[...] if self.mu_bias is not None else None
            rho_b = self.rho_bias[...] if self.rho_bias is not None else None

            S = getattr(self, "_mc_structured", None)
            if S:
                out = linear_ops.sampled_linear_structured(
                    input, self.rngs.noise(), S,
                    self.mu_weight[...], self.rho_weight[...], mu_b,
                    rho_b, eps_w=eps_w, eps_b=eps_b,
                    compute_dtype=self.compute_dtype)
            else:
                out = linear_ops.sampled_linear(
                    input, self.rngs.noise(),
                    self.mu_weight[...], self.rho_weight[...], mu_b,
                    rho_b, eps_w=eps_w, eps_b=eps_b,
                    compute_dtype=self.compute_dtype)

        if return_kl:
            return out, (self.kl_loss() if self.compute_kl else 0.0)
        return out

    def __repr__(self):  # used by MOPED string matching in the reference
        return "LinearReparameterization()"
