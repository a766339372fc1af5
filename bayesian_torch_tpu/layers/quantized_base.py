"""Shared implementation for the 14 INT8 quantized Bayesian layer classes.

Covers the reference's four quantized-layer files (~3300 LoC of
copy-paste variants): quantize_linear_variational.py,
quantize_conv_variational.py, quantized_linear_flipout.py,
quantized_conv_flipout.py. Parameter/semantics parity:

- ``quantize()`` converts float posteriors: symmetric per-tensor int8
  mu and sigma=softplus(rho) with the reference's scale rule
  (2*clamp(max|x|,0,100)/255); bias stays fp32 and is NEVER quantized
  (quantize_linear_variational.py:115-124).
- Conv+BN folding: when bn_* attributes are attached (by
  bnn_to_qbnn.batch_norm_folding), quantize() folds
  gamma/sqrt(var+eps) into mu/sigma and rebuilds the fp32 bias
  (reference quantized_conv_flipout.py:350-386).
- Calibrated forward (``quant_dict`` set): int8 eps draw, quantized
  mul/add to build the sampled weight, uint8-activation int8-weight
  GEMM/conv with int32 accumulation on the MXU, requantized to the
  calibrated output scale, then dequantized
  (quantize_linear_variational.py:172-189).
- Uncalibrated fallback: normal_scale=6/255 eps, default input/output
  scale/zero-point (:202-219).
- Forward returns ``(out, 0)`` — KL is disabled in quantized layers
  (:221-224).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import (
    BaseVariationalLayer,
    default_rngs,
    get_kernel_size,
)
from bayesian_torch_tpu.ops import int8 as q
from bayesian_torch_tpu.ops.qtensor import QTensor
from bayesian_torch_tpu.ops.sampling import sigma_from_rho


class QuantParam(nnx.Variable):
    """Non-trainable quantized parameter (int8 values or scales)."""


class _QuantizedLayerBase(BaseVariationalLayer):
    """Common quantize()/int8-forward machinery.

    Subclasses set ``estimator`` ('reparameterization'|'flipout'),
    ``is_conv``, ``nd``, ``transposed``.
    """

    estimator = "reparameterization"
    is_conv = False
    nd = 2
    transposed = False
    # legacy ao/nn/quantized/modules semantics (reference keeps older
    # snapshots there): default_scale=0.1 (vs 0.2), the bias IS
    # int8-quantized at quantize() time (an int8 round-trip before the
    # fp32 draw), and there is no quant_dict calibrated path
    # (ao/nn/quantized/modules/quantize_linear_variational.py:83,133)
    legacy_ao = False

    # ---- construction ------------------------------------------------

    def _init_common(self, rngs):
        super().__init__()
        if rngs is None:
            rngs = default_rngs()
        self.rngs = rngs
        self.quant_dict = None
        self.is_dequant = False
        self.bn_eps = 1e-5  # bn_* attrs attached by batch_norm_folding
        # q_output=True: emit a QTensor (uint8 + static scale/zp) instead
        # of dequantizing to fp32 — lets activations stay quantized
        # between layers (torch keeps them quantized via QuantStubs;
        # set by bnn_to_qbnn(quantize_activations=True))
        self.q_output = False

    # ---- quantize() ----------------------------------------------------

    def _kernel_attr(self):
        return "mu_kernel" if self.is_conv else "mu_weight"

    def _rho_attr(self):
        return "rho_kernel" if self.is_conv else "rho_weight"

    def _bn_coef(self):
        return self.bn_weight[...] / jnp.sqrt(
            self.bn_running_var[...] + self.bn_eps)

    def quantize(self):
        """Convert float posteriors to int8 (+ optional BN folding)."""
        mu = getattr(self, self._kernel_attr())[...]  # set by surgery
        sigma = sigma_from_rho(getattr(self, self._rho_attr())[...])

        if getattr(self, "bn_weight", None) is not None:
            coef = self._bn_coef()
            bshape = (-1,) + (1,) * (mu.ndim - 1)
            mu = mu * coef.reshape(bshape)
            sigma = sigma * coef.reshape(bshape)

        mu_scale = q.symmetric_scale(mu)
        sigma_scale = q.symmetric_scale(sigma)
        self.quantized_mu_weight = QuantParam(q.quantize_int8(mu, mu_scale))
        self.quantized_sigma_weight = QuantParam(
            q.quantize_int8(sigma, sigma_scale))
        self.mu_weight_scale = QuantParam(mu_scale)
        self.sigma_weight_scale = QuantParam(sigma_scale)
        # quantize() runs on the host (model surgery time), so the
        # scales are also stored as static Python floats: every requant
        # multiplier then constant-folds under jit instead of becoming
        # per-element arithmetic on traced scalars
        self._mu_scale_f = float(mu_scale)
        self._sigma_scale_f = float(sigma_scale)

        has_bias = getattr(self, "mu_bias", None) is not None
        if has_bias:
            mu_b = self.mu_bias[...]
            sigma_b = sigma_from_rho(self.rho_bias[...])
            if getattr(self, "bn_weight", None) is not None:
                coef = self._bn_coef()
                mu_b = (mu_b - self.bn_running_mean[...]) * coef \
                    + self.bn_bias[...]
                sigma_b = sigma_b * coef
            if self.legacy_ao:
                # legacy ao/ modules quantize the bias too (int8
                # round-trip; reference ao/.../quantize_linear_
                # variational.py:115-124 quantizes mu_bias/sigma_bias)
                sb_mu = jnp.where(q.symmetric_scale(mu_b) == 0, 0.1,
                                  q.symmetric_scale(mu_b))
                sb_sig = jnp.where(q.symmetric_scale(sigma_b) == 0, 0.1,
                                   q.symmetric_scale(sigma_b))
                mu_b = q.quantize_int8(mu_b, sb_mu).astype(
                    jnp.float32) * sb_mu
                sigma_b = q.quantize_int8(sigma_b, sb_sig).astype(
                    jnp.float32) * sb_sig
            self.quantized_mu_bias = QuantParam(mu_b)
            self.quantized_sigma_bias = QuantParam(sigma_b)
        elif getattr(self, "bn_weight", None) is not None:
            # conv had no bias; BN folding creates one
            coef = self._bn_coef()
            self.quantized_mu_bias = QuantParam(
                -self.bn_running_mean[...] * coef + self.bn_bias[...])
            self.quantized_sigma_bias = None
            self.bias = True
        else:
            self.quantized_mu_bias = None
            self.quantized_sigma_bias = None

        # drop the float posteriors (reference delattr's them)
        for attr in (self._kernel_attr(), self._rho_attr(), "mu_bias",
                     "rho_bias", "bn_weight", "bn_bias", "bn_running_mean",
                     "bn_running_var"):
            if attr in vars(self):
                try:
                    delattr(self, attr)
                except (AttributeError, TypeError):
                    pass

    # ---- int8 forward helpers ------------------------------------------

    def _qd(self, i):
        d = self.quant_dict[i]
        return float(d["scale"]), float(d["zero_point"])

    def _weight_scales(self):
        """(sigma_scale, mu_scale) as static floats when quantize() ran
        on the host (the common case); falls back to the state arrays
        (restored checkpoints where the floats were not rebuilt)."""
        if getattr(self, "_sigma_scale_f", None) is not None:
            return self._sigma_scale_f, self._mu_scale_f
        return self.sigma_weight_scale[...], self.mu_weight_scale[...]

    def _apply_int8(self, x_q, x_scale, x_zp, w_q, w_scale, bias,
                    out_scale, out_zp):
        if self.is_conv:
            return q.qconv(x_q, x_scale, x_zp, w_q, w_scale, bias,
                           out_scale, out_zp, stride=self.stride,
                           padding=self.padding, dilation=self.dilation,
                           groups=self.groups, transposed=self.transposed,
                           output_padding=self.output_padding,
                           data_format=self.data_format)
        return q.qlinear(x_q, x_scale, x_zp, w_q, w_scale, bias,
                         out_scale, out_zp)

    def _quantize_input(self, x, scale, zp):
        """fp32 -> uint8, or direct uint8 requantize for QTensor inputs
        (no fp32 round trip through HBM)."""
        if isinstance(x, QTensor):
            return x.requantize(scale, zp).q
        return q.quantize_uint8(x, scale, zp)

    def _emit(self, out_q, scale, zp):
        if self.q_output:
            return QTensor(out_q, scale, zp)
        return q.dequantize(out_q, scale, zp)

    def _sample_bias(self, eps_b=None):
        """fp32 sampled bias; mean-only when bias came from BN fusion
        (reference quantize_linear_variational.py:188-193)."""
        if self.quantized_mu_bias is None:
            return None
        if self.quantized_sigma_bias is None:
            return self.quantized_mu_bias[...]
        if eps_b is None:
            eps_b = jax.random.normal(self.rngs.noise(),
                                      self.quantized_mu_bias.shape)
        return (self.quantized_mu_bias[...]
                + self.quantized_sigma_bias[...] * eps_b)

    # ---- forward: reparameterization ------------------------------------

    def _sampled_qweight_reparam(self, normal_scale, eps=None,
                                 eps_b=None):
        """One quantized weight draw: (w_q int8, w_scale, bias fp32).

        Factored out of the forward so a serving deployment can freeze
        a draw across steps (quantization.serving.freeze_quantized_draws)
        — the per-step weight-build is the measured bottleneck of the
        INT8 path (benchmarks/int8_analysis.py). ``eps``/``eps_b`` may
        carry a leading (S, ...) draw axis (the arithmetic is
        elementwise with scalar scales): the scan emission presamples
        all draws' weight builds outside the loop this way
        (parallel.mc._presample_layers_xla)."""
        kshape = self.quantized_mu_weight.shape
        # NOTE: counter-hash fused normals were tried here and LOST:
        # Box-Muller's log/cos on every weight element costs ~1.4 ms of
        # VPU time vs ~0.05 ms of rng-bit-generator HBM traffic (the
        # rbg-backed jax.random.normal is cheap on TPU)
        if eps is None:
            eps = jax.random.normal(self.rngs.noise(), kshape)
        s_sigma, s_mu = self._weight_scales()

        # legacy ao/ classes predate the calibrated quant_dict path
        if self.quant_dict is not None and not self.legacy_ao:
            s0, z0 = self._qd(0)   # eps
            s1, z1 = self._qd(1)   # sigma*eps
            s2, z2 = self._qd(2)   # weight
            eps_q = q.quantize_int8(eps, s0)
            w_q = q.qmul(self.quantized_sigma_weight[...], s_sigma,
                         eps_q, s0, s1, z1)
            w_q = q.qadd(w_q, s1, self.quantized_mu_weight[...], s_mu,
                         s2, z2)
            return w_q, s2, self._sample_bias(eps_b)

        # uncalibrated default path (reference :202-219)
        eps_q = q.quantize_int8(eps, normal_scale)
        new_scale = s_sigma * normal_scale
        w_q = q.qmul(self.quantized_sigma_weight[...], s_sigma, eps_q,
                     normal_scale, new_scale, 0)
        # builtin max keeps static floats static (jnp.maximum would
        # re-trace them into 0-d arrays)
        add_scale = (max(new_scale, s_mu)
                     if isinstance(new_scale, float)
                     and isinstance(s_mu, float)
                     else jnp.maximum(new_scale, s_mu))
        w_q = q.qadd(w_q, new_scale, self.quantized_mu_weight[...], s_mu,
                     add_scale, 0)
        return w_q, add_scale, self._sample_bias(eps_b)

    def _forward_reparam(self, input, normal_scale, default_scale,
                         default_zero_point):
        frozen = getattr(self, "_frozen_w", None)
        pres = getattr(self, "_presampled_qw", None)
        if frozen is not None:
            w_q = frozen[...]
            w_scale = self._frozen_wscale[...]
            bias = self._frozen_bias[...] \
                if self._frozen_bias is not None else None
        elif pres is not None and (
                (self.quant_dict is not None and not self.legacy_ao)
                or normal_scale == getattr(self, "_presampled_qnscale",
                                           6 / 255)):
            # scan-emission presample: this draw's pre-built quantized
            # weight (parallel.mc._presample_layers_xla); the scale is
            # draw-invariant (static per layer). The calibrated
            # quant_dict path never reads normal_scale; on the
            # uncalibrated path the presampled build is only valid for
            # the normal_scale it was built with — a caller passing a
            # different one falls through to the in-body draw below
            # (correct values, loses the presample amortization).
            w_q = pres[...]
            w_scale = self._presampled_qscale
            if not isinstance(w_scale, float):
                w_scale = w_scale[...]
            # bias: presampled when it has a sigma (per-draw); a
            # BN-folded mean-only bias is draw-invariant and comes from
            # the plain path
            bias = (self._presampled_qbias[...]
                    if getattr(self, "_presampled_qbias", None)
                    is not None else self._sample_bias())
        else:
            w_q, w_scale, bias = self._sampled_qweight_reparam(
                normal_scale)

        if self.quant_dict is not None and not self.legacy_ao:
            s3, z3 = self._qd(3)   # input
            s4, z4 = self._qd(4)   # output
            x_q = self._quantize_input(input, s3, z3)
            out_q = self._apply_int8(x_q, s3, z3, w_q, w_scale, bias,
                                     s4, z4)
            return self._emit(out_q, s4, z4)

        x_q = self._quantize_input(input, default_scale, default_zero_point)
        out_q = self._apply_int8(x_q, default_scale, default_zero_point,
                                 w_q, w_scale, bias, default_scale,
                                 default_zero_point)
        return self._emit(out_q, default_scale, default_zero_point)

    # ---- forward: flipout ------------------------------------------------

    def _sampled_qdelta_flipout(self, normal_scale):
        """One quantized perturbation draw: (delta_q int8, delta_scale,
        pert_bias fp32 | None).

        Factored out of the forward so serving can freeze the
        delta-kernel draw across steps (the Rademacher signs stay
        per-call — that is flipout's semantics); mirrors
        ``_sampled_qweight_reparam``."""
        kshape = self.quantized_mu_weight.shape
        eps = jax.random.normal(self.rngs.noise(), kshape)
        s_sigma, _ = self._weight_scales()
        pert_bias = None
        if self.quantized_sigma_bias is not None:
            eps_b = jax.random.normal(self.rngs.noise(),
                                      self.quantized_sigma_bias.shape)
            pert_bias = self.quantized_sigma_bias[...] * eps_b
        if self.quant_dict is not None and not self.legacy_ao:
            s0, _ = self._qd(0)
            s1, z1 = self._qd(1)
            eps_q = q.quantize_int8(eps, s0)
            delta_q = q.qmul(self.quantized_sigma_weight[...], s_sigma,
                             eps_q, s0, s1, z1)
            return delta_q, s1, pert_bias
        eps_q = q.quantize_int8(eps, normal_scale)
        new_scale = s_sigma * normal_scale
        delta_q = q.qmul(self.quantized_sigma_weight[...], s_sigma, eps_q,
                         normal_scale, new_scale, 0)
        return delta_q, new_scale, pert_bias

    def _delta_flipout(self, normal_scale):
        """Frozen draw when serving pinned one, else a fresh draw."""
        frozen = getattr(self, "_frozen_w", None)
        if frozen is not None:
            bias = self._frozen_bias[...] \
                if self._frozen_bias is not None else None
            return frozen[...], self._frozen_wscale[...], bias
        return self._sampled_qdelta_flipout(normal_scale)

    def _forward_flipout(self, x, normal_scale, default_scale,
                         default_zero_point):
        s_sigma, s_mu = self._weight_scales()

        if self.quant_dict is not None and not self.legacy_ao:
            # quant_dict: [eps, delta, x, outputs, sign_in, sign_out,
            #              x_tmp, pert_tmp, perturbed, out]
            # (reference quantized_linear_flipout.py:180-227)
            s2, z2 = self._qd(2)
            s3, z3 = self._qd(3)
            s4, z4 = self._qd(4)
            s5, z5 = self._qd(5)
            s6, z6 = self._qd(6)
            s7, z7 = self._qd(7)
            s8, z8 = self._qd(8)
            s9, z9 = self._qd(9)

            delta_q, s1, pert_bias = self._delta_flipout(normal_scale)
            mean_bias = (self.quantized_mu_bias[...]
                         if self.quantized_mu_bias is not None else None)

            x_q = self._quantize_input(x, s2, z2)
            outputs_q = self._apply_int8(x_q, s2, z2,
                                         self.quantized_mu_weight[...],
                                         s_mu, mean_bias, s3, z3)
            from bayesian_torch_tpu.ops.sampling import rademacher_fused
            k_si, k_so = jax.random.split(self.rngs.noise())
            sign_in = rademacher_fused(k_si, x.shape, jnp.float32)
            sign_out = rademacher_fused(k_so, outputs_q.shape, jnp.float32)
            sign_in_q = q.quantize_uint8(sign_in, s4, z4)
            sign_out_q = q.quantize_uint8(sign_out, s5, z5)
            x_tmp_q = q.qmul(x_q, s2, sign_in_q, s4, s6, z6,
                             a_zp=z2, b_zp=z4, out_dtype=jnp.uint8)
            pert_q = self._apply_int8(x_tmp_q, s6, z6, delta_q, s1,
                                      pert_bias, s7, z7)
            pert_q = q.qmul(pert_q, s7, sign_out_q, s5, s8, z8,
                            a_zp=z7, b_zp=z5, out_dtype=jnp.uint8)
            out_q = q.qadd(outputs_q, s3, pert_q, s8, s9, z9,
                           a_zp=z3, b_zp=z8, out_dtype=jnp.uint8)
            return self._emit(out_q, s9, z9)

        # uncalibrated default path (reference :229-256)
        ds, dz = default_scale, default_zero_point
        mean_bias = (self.quantized_mu_bias[...]
                     if self.quantized_mu_bias is not None else None)
        x_q = self._quantize_input(x, ds, dz)
        outputs_q = self._apply_int8(x_q, ds, dz,
                                     self.quantized_mu_weight[...], s_mu,
                                     mean_bias, ds, dz)
        delta_q, new_scale, pert_bias = self._delta_flipout(normal_scale)
        from bayesian_torch_tpu.ops.sampling import rademacher_fused
        k_si, k_so = jax.random.split(self.rngs.noise())
        sign_in = rademacher_fused(k_si, x.shape, jnp.float32)
        sign_out = rademacher_fused(k_so, outputs_q.shape, jnp.float32)
        sign_in_q = q.quantize_uint8(sign_in, ds, dz)
        sign_out_q = q.quantize_uint8(sign_out, ds, dz)
        x_tmp_q = q.qmul(x_q, ds, sign_in_q, ds, ds, dz, a_zp=dz, b_zp=dz,
                         out_dtype=jnp.uint8)
        pert_q = self._apply_int8(x_tmp_q, ds, dz, delta_q, new_scale,
                                  pert_bias, ds, dz)
        pert_q = q.qmul(pert_q, ds, sign_out_q, ds, ds, dz, a_zp=dz,
                        b_zp=dz, out_dtype=jnp.uint8)
        out_q = q.qadd(outputs_q, ds, pert_q, ds, ds, dz, a_zp=dz, b_zp=dz,
                       out_dtype=jnp.uint8)
        return self._emit(out_q, ds, dz)

    # ---- public forward --------------------------------------------------

    def __call__(self, input, return_kl: bool = True, *,
                 normal_scale: float = 6 / 255,
                 default_scale: Optional[float] = None,
                 default_zero_point: int = 128):
        if self.dnn_to_bnn_flag:
            return_kl = False
        if default_scale is None:
            # legacy ao/ modules use 0.1 ("by grid search"), the newer
            # layers 0.2 (reference forward signatures :133 vs :134)
            default_scale = 0.1 if self.legacy_ao else 0.2
        if self.estimator == "flipout":
            out = self._forward_flipout(input, normal_scale, default_scale,
                                        default_zero_point)
        else:
            out = self._forward_reparam(input, normal_scale, default_scale,
                                        default_zero_point)
        if return_kl:
            return out, 0  # KL disabled in quantized layers
        return out

    def __repr__(self):
        return f"{type(self).__name__}()"


class _QuantizedLinearBase(_QuantizedLayerBase):
    is_conv = False

    def __init__(self, in_features: int, out_features: int, *,
                 rngs: Optional[nnx.Rngs] = None):
        self._init_common(rngs)
        self.in_features = in_features
        self.out_features = out_features
        self.bias = True


class _QuantizedConvBase(_QuantizedLayerBase):
    is_conv = True

    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0, dilation=1, groups: int = 1,
                 output_padding=0, *, rngs: Optional[nnx.Rngs] = None,
                 data_format: str = "NCHW"):
        self._init_common(rngs)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = get_kernel_size(kernel_size, self.nd)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.output_padding = output_padding
        self.data_format = data_format
        self.bias = True
