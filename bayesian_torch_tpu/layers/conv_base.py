"""Shared implementation for all 12 Bayesian conv layer classes.

The reference implements 6 reparameterization conv classes
(conv_variational.py, 1095 LoC) and 6 flipout conv classes
(conv_flipout.py, 1228 LoC) as copy-paste variants. Here one
parameterized base covers all of them; the public subclasses pin
(nd, transposed, estimator) and keep the reference's class names,
constructor signatures, parameter names (mu_kernel/rho_kernel) and
shapes:

- Conv:          (out_channels, in_channels // groups, *kernel_size)
  (reference conv_variational.py:117-124)
- ConvTranspose: (in_channels, out_channels // groups, *kernel_size)
  (reference conv_variational.py:632-647), with ``output_padding``.
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import (
    BaseVariationalLayer,
    default_rngs,
    get_kernel_size,
)
from bayesian_torch_tpu.ops import conv as conv_ops
from bayesian_torch_tpu.ops.kl import gaussian_kl_from_rho


class _BaseConvLayer(BaseVariationalLayer):
    """Common ctor/kl/forward for Bayesian convs; see subclasses."""

    nd: int = 2
    transposed: bool = False
    estimator: str = "reparameterization"  # or "flipout"

    def __init__(self,
                 in_channels: int,
                 out_channels: int,
                 kernel_size,
                 stride=1,
                 padding=0,
                 dilation=1,
                 groups: int = 1,
                 prior_mean: float = 0,
                 prior_variance: float = 1,
                 posterior_mu_init: float = 0,
                 posterior_rho_init: float = -3.0,
                 bias: bool = True,
                 output_padding=0,
                 *,
                 rngs: Optional[nnx.Rngs] = None,
                 compute_dtype=None,
                 data_format: str = "NCHW",
                 impl: str = "xla"):
        super().__init__()
        if in_channels % groups != 0:
            raise ValueError("invalid in_channels size")
        if out_channels % groups != 0:
            raise ValueError("invalid out_channels size")
        if rngs is None:
            rngs = default_rngs()

        kernel_size = get_kernel_size(kernel_size, self.nd)

        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.output_padding = output_padding
        self.prior_mean = prior_mean
        self.prior_variance = prior_variance
        self.posterior_mu_init = posterior_mu_init
        self.posterior_rho_init = posterior_rho_init
        self.bias = bias
        self.compute_dtype = compute_dtype
        self.data_format = data_format
        self.impl = impl
        self.rngs = rngs

        if self.transposed:
            kshape = (in_channels, out_channels // groups) + kernel_size
        else:
            kshape = (out_channels, in_channels // groups) + kernel_size

        self.mu_kernel, self.rho_kernel = self._init_posterior(
            rngs, kshape, posterior_mu_init, posterior_rho_init)
        self.prior_weight_mu, self.prior_weight_sigma = self._init_prior(
            prior_mean, prior_variance)

        if bias:
            self.mu_bias, self.rho_bias = self._init_posterior(
                rngs, (out_channels,), posterior_mu_init, posterior_rho_init)
            self.prior_bias_mu, self.prior_bias_sigma = self._init_prior(
                prior_mean, prior_variance)
        else:
            self.mu_bias = None
            self.rho_bias = None
            self.prior_bias_mu = None
            self.prior_bias_sigma = None

    def kl_loss(self):
        """Reference: conv_variational.py kl_loss (weight mean + bias mean)."""
        kl = gaussian_kl_from_rho(self.mu_kernel[...], self.rho_kernel[...],
                         self.prior_weight_mu[...],
                         self.prior_weight_sigma[...])
        if self.mu_bias is not None:
            kl = kl + gaussian_kl_from_rho(self.mu_bias[...], self.rho_bias[...],
                                  self.prior_bias_mu[...],
                                  self.prior_bias_sigma[...])
        return kl

    def prepare(self, qconfig=None):
        """Insert PTQ calibration observers (reparam: 5 qint8 + 2 quint8,
        conv_variational.py prepare; flipout: 4 qint8 + 8 quint8,
        conv_flipout.py prepare)."""
        if self.estimator == "flipout":
            self._make_observers(4, 8, qconfig)
        else:
            self._make_observers(5, 2, qconfig)

    def _conv_args(self):
        return dict(stride=self.stride, padding=self.padding,
                    output_padding=self.output_padding,
                    dilation=self.dilation, groups=self.groups,
                    data_format=self.data_format)

    def _observed_forward(self, input):
        """Calibration forward with every intermediate observed
        (reference conv_variational.py:357-396 / conv_flipout.py:369-433)."""
        import jax
        from bayesian_torch_tpu.ops.conv import _apply_conv
        from bayesian_torch_tpu.ops.sampling import sigma_from_rho

        args = self._conv_args()
        sigma = sigma_from_rho(self.rho_kernel[...])
        eps = jax.random.normal(self.rngs.noise(), self.mu_kernel.shape)
        if self.estimator == "flipout":
            outputs = _apply_conv(
                input, self.mu_kernel[...],
                self.mu_bias[...] if self.mu_bias is not None else None,
                self.transposed, compute_dtype=None, **args)
            sign_in = jax.random.rademacher(self.rngs.noise(), input.shape,
                                            input.dtype)
            sign_out = jax.random.rademacher(self.rngs.noise(),
                                             outputs.shape, outputs.dtype)
            delta = sigma * eps
            pert_bias = None
            if self.mu_bias is not None:
                sigma_b = sigma_from_rho(self.rho_bias[...])
                eps_b = jax.random.normal(self.rngs.noise(),
                                          self.mu_bias.shape)
                pert_bias = sigma_b * eps_b
            x_tmp = input * sign_in
            pert_tmp = _apply_conv(x_tmp, delta, pert_bias, self.transposed,
                                   compute_dtype=None, **args)
            perturbed = pert_tmp * sign_out
            out = outputs + perturbed

            for ob, v in zip(self.quint_quant,
                             (input, outputs, sign_in, sign_out, x_tmp,
                              pert_tmp, perturbed, out)):
                ob(v)
            for ob, v in zip(self.qint_quant,
                             (sigma, self.mu_kernel[...], eps, delta)):
                ob(v)
            return out

        tmp_result = sigma * eps
        weight = self.mu_kernel[...] + tmp_result
        bias = None
        if self.mu_bias is not None:
            sigma_b = sigma_from_rho(self.rho_bias[...])
            eps_b = jax.random.normal(self.rngs.noise(), self.mu_bias.shape)
            bias = self.mu_bias[...] + sigma_b * eps_b
        out = _apply_conv(input, weight, bias, self.transposed,
                          compute_dtype=None, **args)
        self.quint_quant[0](input)
        self.quint_quant[1](out)
        for ob, v in zip(self.qint_quant,
                         (sigma, self.mu_kernel[...], eps, tmp_result,
                          weight)):
            ob(v)
        return out

    def __call__(self, input, return_kl: bool = True, *,
                 eps_k=None, eps_b=None, sign_in=None, sign_out=None):
        if self.dnn_to_bnn_flag:
            return_kl = False

        if self.quant_prepare:
            out = self._observed_forward(input)
            if return_kl:
                return out, (self.kl_loss() if self.compute_kl else 0.0)
            return out

        if getattr(self, "_presampled_w", None) is not None:
            # fused-sampler path (parallel.mc.mc_forward):
            # reparam: _presampled_w is the sampled kernel;
            # flipout: it is delta_kernel = sigma*eps (mean conv uses mu)
            from bayesian_torch_tpu.ops.conv import _apply_conv
            args = self._conv_args()
            b = (self._presampled_b[...]
                 if getattr(self, "_presampled_b", None) is not None
                 else None)
            if self.estimator == "flipout":
                mu_b = (self.mu_bias[...] if self.mu_bias is not None
                        else None)
                mean_out = _apply_conv(input, self.mu_kernel[...], mu_b,
                                       self.transposed,
                                       compute_dtype=self.compute_dtype,
                                       **args)
                k_si, k_so = jax.random.split(self.rngs.noise())
                s_in = jax.random.rademacher(k_si, input.shape, input.dtype)
                s_out = jax.random.rademacher(k_so, mean_out.shape,
                                              mean_out.dtype)
                pert = _apply_conv(input * s_in, self._presampled_w[...],
                                   b, self.transposed,
                                   compute_dtype=self.compute_dtype,
                                   **args)
                out = mean_out + pert * s_out
            else:
                out = _apply_conv(input, self._presampled_w[...], b,
                                  self.transposed,
                                  compute_dtype=self.compute_dtype,
                                  **args)
            if return_kl:
                return out, (self.kl_loss() if self.compute_kl else 0.0)
            return out

        mu_b = self.mu_bias[...] if self.mu_bias is not None else None
        rho_b = self.rho_bias[...] if self.rho_bias is not None else None

        S = getattr(self, "_mc_structured", None)
        if S:
            # explicit channel-tiled MC axis (parallel.mc structured
            # mode): input (B, *sp, S*C) -> output (B, *sp, S*O)
            if self.transposed or not self.data_format.endswith("C"):
                raise NotImplementedError(
                    "structured MC mode supports channels-last "
                    "non-transposed convs only")
            if self.estimator == "flipout":
                out = conv_ops.flipout_conv_structured(
                    input, self.rngs.noise(), S,
                    self.mu_kernel[...], self.rho_kernel[...], mu_b,
                    rho_b, stride=self.stride, padding=self.padding,
                    dilation=self.dilation, groups=self.groups,
                    compute_dtype=self.compute_dtype,
                    eps_k=eps_k, eps_b=eps_b, sign_in=sign_in,
                    sign_out=sign_out)
            else:
                out = conv_ops.sampled_conv_structured(
                    input, self.rngs.noise(), S,
                    self.mu_kernel[...], self.rho_kernel[...], mu_b,
                    rho_b, stride=self.stride, padding=self.padding,
                    dilation=self.dilation, groups=self.groups,
                    compute_dtype=self.compute_dtype,
                    eps_k=eps_k, eps_b=eps_b)
            if return_kl:
                return out, (self.kl_loss() if self.compute_kl else 0.0)
            return out

        common = dict(stride=self.stride, padding=self.padding,
                      output_padding=self.output_padding,
                      dilation=self.dilation, groups=self.groups,
                      transposed=self.transposed,
                      compute_dtype=self.compute_dtype,
                      data_format=self.data_format)

        # scan-emission eps presample (parallel.mc): raw draws made
        # outside the loop; delta/sampling algebra stays in-body so the
        # fused fast paths are unchanged
        if eps_k is None and getattr(self, "_presampled_eps",
                                     None) is not None:
            eps_k = self._presampled_eps[...]
        if eps_b is None and getattr(self, "_presampled_eps_b",
                                     None) is not None:
            eps_b = self._presampled_eps_b[...]

        if self.estimator == "flipout":
            out = conv_ops.flipout_conv(
                input, self.rngs.noise(),
                self.mu_kernel[...], self.rho_kernel[...], mu_b, rho_b,
                eps_k=eps_k, eps_b=eps_b, sign_in=sign_in,
                sign_out=sign_out, **common)
        else:
            out = conv_ops.sampled_conv(
                input, self.rngs.noise(),
                self.mu_kernel[...], self.rho_kernel[...], mu_b, rho_b,
                eps_k=eps_k, eps_b=eps_b, **common)

        if return_kl:
            return out, (self.kl_loss() if self.compute_kl else 0.0)
        return out

    def __repr__(self):
        return f"{type(self).__name__}()"
