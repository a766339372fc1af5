"""Weight-noise sampling primitives.

The reference draws noise by mutating non-persistent buffers in place
(``self.eps_weight.data.normal_()``, linear_variational.py:161). The
TPU-native design threads explicit PRNG keys: every draw is a pure
function of a key, which makes MC-vmap, sharding, and test determinism
(inject a fixed eps) trivial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigma_from_rho(rho):
    """sigma = softplus(rho) = log1p(exp(rho)).

    Reference: linear_variational.py:160.
    """
    return jax.nn.softplus(rho)


def log_sigma_from_rho(rho):
    """log(softplus(rho)), stable for very negative rho.

    For rho << 0, softplus(rho) ~= exp(rho) underflows to a subnormal that
    XLA's flush-to-zero turns into 0, making log(sigma) -inf where torch
    (which keeps subnormals) returns ~rho. Branch to the asymptote
    log(softplus(rho)) -> rho for rho < -20 (error < 1e-9 there).
    """
    safe = jnp.where(rho < -20.0, 0.0, rho)
    return jnp.where(rho < -20.0, rho, jnp.log(jax.nn.softplus(safe)))


def sample_gaussian_weight(key, mu, rho, eps=None):
    """W = mu + softplus(rho) * eps, eps ~ N(0, I).

    ``eps`` may be injected for golden-value tests (the reference
    equivalently allows presetting the eps buffer).
    Returns (weight, sigma).
    """
    sigma = sigma_from_rho(rho)
    if eps is None:
        eps = jax.random.normal(key, jnp.shape(mu), dtype=jnp.result_type(mu))
    return mu + sigma * eps, sigma


def rademacher(key, shape, dtype=jnp.float32):
    """iid signs in {-1, +1}.

    The reference samples ``uniform(-1,1).sign()`` per call
    (linear_flipout.py:169-170); distributionally identical.
    """
    return jax.random.rademacher(key, shape, dtype=dtype)
