"""Sampled / Flipout linear ops (K1 and K2 of SURVEY.md §2.4), XLA path.

These pure functions are the hot path behind ``LinearReparameterization``
and ``LinearFlipout``. Under jit, XLA fuses the softplus+mul+add weight
build into the GEMM's operand pipeline; the Pallas path
(``ops/pallas/sampled_matmul.py``) additionally draws eps on-chip so the
sampled W never round-trips through HBM.

Reference delegation sites being replaced:
- reparam: linear_variational.py:160-178 (eps normal_ + elementwise +
  F.linear)
- flipout: linear_flipout.py:145-174 (two F.linear + sign flips)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bayesian_torch_tpu.ops.sampling import sample_gaussian_weight, sigma_from_rho


def _linear(x, w, b=None, compute_dtype=None):
    """y = x @ w^T + b with torch-layout weight (out_features, in_features)."""
    preferred = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        preferred = compute_dtype  # f32-accumulated, emitted in bf16
    out = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=preferred,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def sampled_linear(x, key, mu_w, rho_w, mu_b=None, rho_b=None, *,
                   eps_w=None, eps_b=None, compute_dtype=None):
    """Reparameterization-estimator linear: W,b sampled per call.

    Returns the output only; KL is a separate pure function of the
    parameters (ops.kl.gaussian_kl), so ELBO code can evaluate it once
    instead of per MC sample.
    """
    kw, kb = jax.random.split(key)
    if compute_dtype is not None:
        # sample directly in the compute dtype: halves the sampling
        # traffic and feeds the GEMM without a separate cast pass
        mu_w, rho_w = mu_w.astype(compute_dtype), rho_w.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_w is not None:
            eps_w = eps_w.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)
    w, _ = sample_gaussian_weight(kw, mu_w, rho_w, eps=eps_w)
    b = None
    if mu_b is not None:
        b, _ = sample_gaussian_weight(kb, mu_b, rho_b, eps=eps_b)
    return _linear(x, w, b, compute_dtype)


def flipout_linear(x, key, mu_w, rho_w, mu_b=None, rho_b=None, *,
                   eps_w=None, eps_b=None, sign_in=None, sign_out=None,
                   compute_dtype=None):
    """Flipout-estimator linear (Wen et al. 2018).

    out = (x @ mu^T + mu_b) + sign_out * ((x*sign_in) @ (sigma*eps)^T + sigma_b*eps_b)

    Matches reference linear_flipout.py:145-174 exactly: the mean bias
    rides the first GEMM; only sigma_b*eps_b (no mu_b) rides the
    perturbation GEMM; signs are iid Rademacher with input signs shaped
    like x and output signs shaped like the output.
    """
    from bayesian_torch_tpu.ops.sampling import rademacher_fused

    k_eps, k_epsb, k_sin, k_sout = jax.random.split(key, 4)
    if compute_dtype is not None:
        # sample and sign-flip in the compute dtype (see sampled_linear)
        x = x.astype(compute_dtype)
        mu_w, rho_w = mu_w.astype(compute_dtype), rho_w.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_w is not None:
            eps_w = eps_w.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)
    sigma_w = sigma_from_rho(rho_w)
    if eps_w is None:
        eps_w = jax.random.normal(k_eps, mu_w.shape, mu_w.dtype)
    delta_w = sigma_w * eps_w

    mean_out = _linear(x, mu_w, mu_b, compute_dtype)

    pert_bias = None
    if mu_b is not None:
        sigma_b = sigma_from_rho(rho_b)
        if eps_b is None:
            eps_b = jax.random.normal(k_epsb, mu_b.shape, mu_b.dtype)
        pert_bias = sigma_b * eps_b

    if sign_in is None:
        sign_in = rademacher_fused(k_sin, x.shape, x.dtype)
    if sign_out is None:
        sign_out = rademacher_fused(k_sout, mean_out.shape, mean_out.dtype)
    perturbed = _linear(x * sign_in, delta_w, pert_bias, compute_dtype)
    return mean_out + perturbed * sign_out


def flipout_linear_structured(x, key, num_mc, mu_w, rho_w, mu_b=None,
                              rho_b=None, *, eps_w=None, eps_b=None,
                              sign_in=None, sign_out=None,
                              compute_dtype=None):
    """Flipout linear over an EXPLICIT channel-tiled MC axis.

    ``x`` is (B, S*C) with draw s in block s (or (B, C) — tiled).
    Returns (B, S*O). Mean GEMM shares mu across draws
    (einsum bsc,oc->bso); the perturbation GEMM is a batched per-draw
    dot (einsum bsc,soc->bso). Math identical to ``flipout_linear``
    per draw; see ops/conv.py::flipout_conv_structured for why this
    exists (no vmap batching-dim transposes).
    """
    from bayesian_torch_tpu.ops.sampling import rademacher_fused

    S = num_mc
    out_f, in_f = mu_w.shape
    k_eps, k_epsb, k_sin, k_sout = jax.random.split(key, 4)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        mu_w, rho_w = mu_w.astype(compute_dtype), rho_w.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_w is not None:
            eps_w = eps_w.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)

    if x.shape[-1] == in_f:
        x = jnp.tile(x, (1,) * (x.ndim - 1) + (S,))
    lead = x.shape[:-1]
    xs = x.reshape(lead + (S, in_f))

    sigma_w = sigma_from_rho(rho_w)
    if eps_w is None:
        eps_w = jax.random.normal(k_eps, (S,) + mu_w.shape, mu_w.dtype)
    delta = sigma_w * eps_w  # (S, O, C)

    if sign_in is None:
        sign_in = rademacher_fused(k_sin, xs.shape, xs.dtype)

    preferred = jnp.float32 if compute_dtype is None else compute_dtype
    mean = jnp.einsum("...sc,oc->...so", xs, mu_w,
                      preferred_element_type=preferred)
    pert = jnp.einsum("...sc,soc->...so", xs * sign_in, delta,
                      preferred_element_type=preferred)
    if mu_b is not None:
        mean = mean + mu_b.astype(mean.dtype)
        sigma_b = sigma_from_rho(rho_b)
        if eps_b is None:
            eps_b = jax.random.normal(k_epsb, (S,) + mu_b.shape,
                                      mu_b.dtype)
        pert = pert + (sigma_b * eps_b).astype(pert.dtype)
    if sign_out is None:
        sign_out = rademacher_fused(k_sout, mean.shape, mean.dtype)
    out = mean + pert * sign_out
    return out.reshape(lead + (S * out_f,))


def sampled_linear_structured(x, key, num_mc, mu_w, rho_w, mu_b=None,
                              rho_b=None, *, eps_w=None, eps_b=None,
                              compute_dtype=None):
    """Reparameterization linear over an EXPLICIT channel-tiled MC axis.

    ``x`` is (B, S*C) with draw s in block s (or (B, C) — tiled).
    Per-draw sampled W_s feed a batched dot (einsum bsc,soc->bso);
    returns (B, S*O). See flipout_linear_structured.
    """
    S = num_mc
    out_f, in_f = mu_w.shape
    kw, kb = jax.random.split(key)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        mu_w, rho_w = mu_w.astype(compute_dtype), rho_w.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_w is not None:
            eps_w = eps_w.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)

    if x.shape[-1] == in_f:
        x = jnp.tile(x, (1,) * (x.ndim - 1) + (S,))
    lead = x.shape[:-1]
    xs = x.reshape(lead + (S, in_f))

    sigma_w = sigma_from_rho(rho_w)
    if eps_w is None:
        eps_w = jax.random.normal(kw, (S,) + mu_w.shape, mu_w.dtype)
    w = mu_w + sigma_w * eps_w  # (S, O, C)

    preferred = jnp.float32 if compute_dtype is None else compute_dtype
    out = jnp.einsum("...sc,soc->...so", xs, w,
                     preferred_element_type=preferred)
    if mu_b is not None:
        sigma_b = sigma_from_rho(rho_b)
        if eps_b is None:
            eps_b = jax.random.normal(kb, (S,) + mu_b.shape, mu_b.dtype)
        out = out + (mu_b + sigma_b * eps_b).astype(out.dtype)
    return out.reshape(lead + (S * out_f,))
