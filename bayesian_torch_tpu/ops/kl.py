"""Closed-form Gaussian KL divergence (fused reduction target K3).

Reference semantics (bayesian_torch/layers/base_variational_layer.py:53-68):
``kl = log(sigma_p) - log(sigma_q) + (sigma_q^2 + (mu_q-mu_p)^2) /
(2 sigma_p^2) - 0.5`` reduced by **mean** over elements. Per layer, the
weight KL and bias KL are means over their own element counts and then
*added* (linear_variational.py:144-155) — not a size-weighted mean. The
framework-level ``get_kl_loss`` sums these per-layer scalars.

Under ``jax.jit`` the elementwise expression + mean fuses into a single
HBM pass per parameter tensor; no Python-loop module walk survives
tracing, so this is already the "single fused reduction" the survey's K3
calls for.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_kl(mu_q, sigma_q, mu_p, sigma_p, *, log_sigma_q=None):
    """Mean-reduced KL(N(mu_q, sigma_q^2) || N(mu_p, sigma_p^2)).

    ``mu_p``/``sigma_p`` may be scalars (the common config-prior case) or
    arrays broadcastable against ``mu_q`` (MOPED empirical priors).
    ``log_sigma_q`` may be supplied for numerical stability when sigma_q
    underflows (see ops.sampling.log_sigma_from_rho).
    """
    mu_p = jnp.asarray(mu_p, dtype=mu_q.dtype)
    sigma_p = jnp.asarray(sigma_p, dtype=mu_q.dtype)
    if log_sigma_q is None:
        log_sigma_q = jnp.log(sigma_q)
    kl = (jnp.log(sigma_p) - log_sigma_q
          + (sigma_q ** 2 + (mu_q - mu_p) ** 2) / (2.0 * sigma_p ** 2)
          - 0.5)
    return jnp.mean(kl)


def gaussian_kl_from_rho(mu_q, rho_q, mu_p, sigma_p):
    """gaussian_kl with sigma_q = softplus(rho_q), underflow-stable."""
    from bayesian_torch_tpu.ops.sampling import (log_sigma_from_rho,
                                                 sigma_from_rho)
    return gaussian_kl(mu_q, sigma_from_rho(rho_q), mu_p, sigma_p,
                       log_sigma_q=log_sigma_from_rho(rho_q))
