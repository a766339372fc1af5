"""Shared Bayesian LSTM implementation (reparameterization + flipout).

TPU-native counterpart of reference rnn_variational.py:46-153 and
rnn_flipout.py:46-153. The reference unrolls a Python loop over time and
*resamples the weights at every timestep* (each ``self.ih(x_t)`` call
redraws eps — rnn_variational.py:126-127 → linear_variational.py:161).
Here the time loop is a single ``lax.scan`` (one compiled step, no
per-timestep dispatch) with per-step key folding reproducing the
resampling semantics; ``resample_per_step=False`` gives the cheaper
sample-once-per-sequence variant as an explicit option (SURVEY.md §5
"LSTM weight-resampling semantics").

Return convention matches the reference exactly, including its quirk of
returning the full hidden sequence (not the last state) as the first
element of the state tuple: ``(hidden_seq, (hidden_seq, c_seq), kl)``
(rnn_variational.py:151-153). Per-step KL accumulation reduces to
``seq_len * (kl_ih + kl_hh)`` because the KL depends only on parameters,
so it is computed once — identical value, no per-step recompute.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from bayesian_torch_tpu.layers.base_variational_layer import (
    BaseVariationalLayer,
    default_rngs,
)
from bayesian_torch_tpu.ops import linear as linear_ops
from bayesian_torch_tpu.ops.sampling import sample_gaussian_weight


class _BaseLSTMLayer(BaseVariationalLayer):
    estimator: str = "reparameterization"  # or "flipout"
    _linear_cls = None  # set in __init_subclass__ wiring below

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
                 resample_per_step: bool = True):
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
        self.resample_per_step = resample_per_step
        self.rngs = rngs

        # Same cell decomposition as the reference: ih (in -> 4H) and
        # hh (H -> 4H) Bayesian linear blocks (rnn_variational.py:80-96).
        from bayesian_torch_tpu.layers.variational_layers.linear_variational import (
            LinearReparameterization,
        )
        from bayesian_torch_tpu.layers.flipout_layers.linear_flipout import (
            LinearFlipout,
        )
        linear_cls = (LinearFlipout if self.estimator == "flipout"
                      else LinearReparameterization)
        common = dict(prior_mean=prior_mean, prior_variance=prior_variance,
                      posterior_mu_init=posterior_mu_init,
                      posterior_rho_init=posterior_rho_init, bias=bias,
                      rngs=rngs, compute_dtype=compute_dtype)
        self.ih = linear_cls(in_features, out_features * 4, **common)
        self.hh = linear_cls(out_features, out_features * 4, **common)

    def kl_loss(self):
        """kl(ih) + kl(hh), reference rnn_variational.py:98-101."""
        return self.ih.kl_loss() + self.hh.kl_loss()

    def _step_linear(self, x, key, lin):
        """One sampled/flipout linear application with explicit key."""
        mu_b = lin.mu_bias[...] if lin.mu_bias is not None else None
        rho_b = lin.rho_bias[...] if lin.rho_bias is not None else None
        if self.estimator == "flipout":
            return linear_ops.flipout_linear(
                x, key, lin.mu_weight[...], lin.rho_weight[...], mu_b, rho_b,
                compute_dtype=self.compute_dtype)
        return linear_ops.sampled_linear(
            x, key, lin.mu_weight[...], lin.rho_weight[...], mu_b, rho_b,
            compute_dtype=self.compute_dtype)

    def __call__(self, X, hidden_states=None, return_kl: bool = True):
        if self.dnn_to_bnn_flag:
            return_kl = False

        batch_size, seq_size, _ = X.shape
        HS = self.out_features

        if hidden_states is None:
            h0 = jnp.zeros((batch_size, HS), X.dtype)
            c0 = jnp.zeros((batch_size, HS), X.dtype)
        else:
            h0, c0 = hidden_states

        base_key = self.rngs.noise()
        xs = jnp.swapaxes(X, 0, 1)  # (seq, batch, feature)

        if hasattr(self.ih, "quantized_mu_weight"):
            # INT8-quantized cell (bnn_to_qbnn quantized the ih/hh
            # blocks): sample the int8 posteriors once per sequence and
            # scan with fixed dequantized weights (weight-only
            # quantization — the reference's LSTM quantization path is
            # broken, bnn_to_qbnn.py:147-156, so these semantics are
            # this framework's).
            from bayesian_torch_tpu.ops.int8 import dequantize

            def deq_weight(lin, key):
                eps = jax.random.normal(key, lin.quantized_mu_weight.shape)
                w = (dequantize(lin.quantized_mu_weight[...],
                                lin.mu_weight_scale[...])
                     + dequantize(lin.quantized_sigma_weight[...],
                                  lin.sigma_weight_scale[...]) * eps)
                return w

            k_i, k_h = jax.random.split(base_key)
            w_ih = deq_weight(self.ih, k_i)
            w_hh = deq_weight(self.hh, k_h)
            b_ih = self.ih._sample_bias()
            b_hh = self.hh._sample_bias()
            b = None
            if b_ih is not None:
                b = b_ih + (b_hh if b_hh is not None else 0.0)

            def step(carry, x_t):
                h, c = carry
                gates = x_t @ w_ih.T + h @ w_hh.T
                if b is not None:
                    gates = gates + b
                i_t = jax.nn.sigmoid(gates[:, :HS])
                f_t = jax.nn.sigmoid(gates[:, HS:2 * HS])
                g_t = jnp.tanh(gates[:, 2 * HS:3 * HS])
                o_t = jax.nn.sigmoid(gates[:, 3 * HS:])
                c = f_t * c + i_t * g_t
                h = o_t * jnp.tanh(c)
                return (h, c), (h, c)

            (_, _), (h_seq, c_seq) = jax.lax.scan(step, (h0, c0), xs)
            hidden_seq = jnp.swapaxes(h_seq, 0, 1)
            c_ts = jnp.swapaxes(c_seq, 0, 1)
            if return_kl:
                return hidden_seq, (hidden_seq, c_ts), 0.0
            return hidden_seq, (hidden_seq, c_ts)

        if self.resample_per_step:
            def step(carry, inp):
                h, c = carry
                t, x_t = inp
                kt = jax.random.fold_in(base_key, t)
                k_i, k_h = jax.random.split(kt)
                gates = (self._step_linear(x_t, k_i, self.ih)
                         + self._step_linear(h, k_h, self.hh))
                i_t = jax.nn.sigmoid(gates[:, :HS])
                f_t = jax.nn.sigmoid(gates[:, HS:2 * HS])
                g_t = jnp.tanh(gates[:, 2 * HS:3 * HS])
                o_t = jax.nn.sigmoid(gates[:, 3 * HS:])
                c = f_t * c + i_t * g_t
                h = o_t * jnp.tanh(c)
                return (h, c), (h, c)

            ts = jnp.arange(seq_size)
            (_, _), (h_seq, c_seq) = jax.lax.scan(step, (h0, c0), (ts, xs))
        else:
            # Sample both weight matrices once; scan with fixed weights.
            k_i, k_ib, k_h, k_hb = jax.random.split(base_key, 4)
            w_ih, _ = sample_gaussian_weight(k_i, self.ih.mu_weight[...],
                                             self.ih.rho_weight[...])
            w_hh, _ = sample_gaussian_weight(k_h, self.hh.mu_weight[...],
                                             self.hh.rho_weight[...])
            b = None
            if self.bias:
                b_ih, _ = sample_gaussian_weight(k_ib, self.ih.mu_bias[...],
                                                 self.ih.rho_bias[...])
                b_hh, _ = sample_gaussian_weight(k_hb, self.hh.mu_bias[...],
                                                 self.hh.rho_bias[...])
                b = b_ih + b_hh

            def step(carry, x_t):
                h, c = carry
                gates = x_t @ w_ih.T + h @ w_hh.T
                if b is not None:
                    gates = gates + b
                i_t = jax.nn.sigmoid(gates[:, :HS])
                f_t = jax.nn.sigmoid(gates[:, HS:2 * HS])
                g_t = jnp.tanh(gates[:, 2 * HS:3 * HS])
                o_t = jax.nn.sigmoid(gates[:, 3 * HS:])
                c = f_t * c + i_t * g_t
                h = o_t * jnp.tanh(c)
                return (h, c), (h, c)

            (_, _), (h_seq, c_seq) = jax.lax.scan(step, (h0, c0), xs)

        hidden_seq = jnp.swapaxes(h_seq, 0, 1)  # (batch, seq, feature)
        c_ts = jnp.swapaxes(c_seq, 0, 1)

        if return_kl:
            # Reference accumulates (kl_ih + kl_hh) each timestep
            # (rnn_variational.py:123-130); identical closed form:
            kl = (seq_size * self.kl_loss()) if self.compute_kl else 0.0
            return hidden_seq, (hidden_seq, c_ts), kl
        return hidden_seq, (hidden_seq, c_ts)

    def __repr__(self):
        return f"{type(self).__name__}()"
