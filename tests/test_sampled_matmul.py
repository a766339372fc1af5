"""Fused sample-then-GEMM kernel (K1 proper): consistency + VJP math.

Interpret mode stubs the PRNG to constant bits, so these tests verify
the algebra against the kernel's own implied weights (extracted with an
identity probe); distribution quality and cross-call eps determinism
are verified on real TPU hardware (see
ops/pallas/sampled_matmul.py / BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
    sampled_matmul_pallas,
)


def _setup(K=70, N=50, M=30, seed=0):
    rs = np.random.RandomState(seed)
    mu = jnp.asarray(rs.randn(N, K).astype(np.float32) * 0.3)
    rho = jnp.asarray(rs.randn(N, K).astype(np.float32) - 2.0)
    x = jnp.asarray(rs.randn(M, K).astype(np.float32))
    return x, mu, rho


def _implied_weight(key, mu, rho):
    K = mu.shape[1]
    return np.asarray(sampled_matmul_pallas(
        key, jnp.eye(K), mu, rho, out_dtype=jnp.float32)).T


def test_forward_is_affine_in_x():
    key = jax.random.key(5)
    x, mu, rho = _setup()
    W = _implied_weight(key, mu, rho)
    out = sampled_matmul_pallas(key, x, mu, rho, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) @ W.T,
                               rtol=1e-3, atol=1e-3)


def test_implied_weight_matches_mu_sigma_form():
    key = jax.random.key(5)
    x, mu, rho = _setup()
    W = _implied_weight(key, mu, rho)
    sigma = np.log1p(np.exp(np.asarray(rho)))
    eps = (W - np.asarray(mu)) / sigma
    # W from a zero-mu probe must imply the SAME eps (regeneration)
    W0 = _implied_weight(key, jnp.zeros_like(mu), rho)
    np.testing.assert_allclose(W0 / sigma, eps, rtol=1e-3, atol=1e-3)


def test_custom_vjp_math():
    key = jax.random.key(5)
    x, mu, rho = _setup()
    W = _implied_weight(key, mu, rho)
    sigma = np.log1p(np.exp(np.asarray(rho)))
    eps = (W - np.asarray(mu)) / sigma

    def loss(x, mu, rho):
        return (sampled_matmul_pallas(key, x, mu, rho,
                                      out_dtype=jnp.float32) ** 2).sum()

    out = np.asarray(sampled_matmul_pallas(key, x, mu, rho,
                                           out_dtype=jnp.float32))
    g = 2 * out
    gx, gmu, grho = jax.grad(loss, argnums=(0, 1, 2))(x, mu, rho)
    np.testing.assert_allclose(np.asarray(gx), g @ W, rtol=1e-2, atol=0.1)
    np.testing.assert_allclose(np.asarray(gmu), g.T @ np.asarray(x),
                               rtol=1e-2, atol=0.1)
    sig_g = 1 / (1 + np.exp(-np.asarray(rho)))
    np.testing.assert_allclose(np.asarray(grho),
                               (g.T @ np.asarray(x)) * eps * sig_g,
                               rtol=1e-2, atol=0.1)


def test_linear_layer_pallas_impl():
    from bayesian_torch_tpu.layers import LinearReparameterization

    m = LinearReparameterization(20, 12, impl="pallas",
                                 rngs=nnx.Rngs(params=0, noise=1))
    out, kl = m(jnp.ones((3, 20)))
    assert out.shape == (3, 12)
    assert float(kl) > 0
    # ND input path
    out2, _ = m(jnp.ones((2, 3, 20)))
    assert out2.shape == (2, 3, 12)


# ---- S-batched kernel + custom_vmap rule (MC-axis composition) ----


def test_batched_matches_unbatched_per_lane():
    from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
        sampled_matmul_pallas_batched,
    )

    x, mu, rho = _setup()
    keys = jax.random.split(jax.random.key(3), 4)
    xs = jnp.stack([x + i for i in range(4)])
    out_b = sampled_matmul_pallas_batched(keys, xs, mu, rho,
                                          out_dtype=jnp.float32)
    assert out_b.shape == (4, x.shape[0], mu.shape[0])
    for s in range(4):
        out_s = sampled_matmul_pallas(keys[s], xs[s], mu, rho,
                                      out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out_b[s]), np.asarray(out_s),
                                   rtol=1e-3, atol=1e-3)


def test_vmap_dispatches_batched_kernel():
    x, mu, rho = _setup()
    keys = jax.random.split(jax.random.key(3), 3)

    # batched key, shared x (the mc_forward shape)
    out = jax.vmap(
        lambda k: sampled_matmul_pallas(k, x, mu, rho,
                                        out_dtype=jnp.float32))(keys)
    assert out.shape == (3, x.shape[0], mu.shape[0])
    for s in range(3):
        ref = sampled_matmul_pallas(keys[s], x, mu, rho,
                                    out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out[s]), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    # batched key AND batched x
    xs = jnp.stack([x, x * 2, x - 1])
    out2 = jax.vmap(
        lambda k, xx: sampled_matmul_pallas(k, xx, mu, rho,
                                            out_dtype=jnp.float32))(keys, xs)
    ref2 = sampled_matmul_pallas(keys[1], xs[1], mu, rho,
                                 out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(ref2),
                               rtol=1e-3, atol=1e-3)


def test_vmap_over_posterior_raises():
    import pytest

    x, mu, rho = _setup()
    key = jax.random.key(0)
    mus = jnp.stack([mu, mu * 2])
    with pytest.raises(NotImplementedError, match="MC-sample axis"):
        jax.vmap(
            lambda m: sampled_matmul_pallas(key, x, m, rho,
                                            out_dtype=jnp.float32))(mus)


def test_grad_through_vmapped_call():
    """Sum-over-lanes loss: dmu must equal the sum of per-lane
    unbatched gradients (regenerate-eps VJP through the S kernel)."""
    x, mu, rho = _setup(K=40, N=24, M=16)
    keys = jax.random.split(jax.random.key(7), 3)

    def loss_vmapped(mu, rho):
        outs = jax.vmap(
            lambda k: sampled_matmul_pallas(k, x, mu, rho,
                                            out_dtype=jnp.float32))(keys)
        return (outs ** 2).sum()

    def loss_single(mu, rho, k):
        return (sampled_matmul_pallas(k, x, mu, rho,
                                      out_dtype=jnp.float32) ** 2).sum()

    gmu_v, grho_v = jax.grad(loss_vmapped, argnums=(0, 1))(mu, rho)
    gmu_ref = sum(np.asarray(jax.grad(loss_single, argnums=0)(mu, rho, k))
                  for k in keys)
    grho_ref = sum(np.asarray(jax.grad(loss_single, argnums=1)(mu, rho, k))
                   for k in keys)
    np.testing.assert_allclose(np.asarray(gmu_v), gmu_ref, rtol=1e-2,
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(grho_v), grho_ref, rtol=1e-2,
                               atol=0.05)


def test_mc_forward_over_pallas_linear():
    """The two flagship features compose now: impl='pallas' +
    mc_forward's vmapped MC axis (VERDICT weak-item 4)."""
    from bayesian_torch_tpu.layers import LinearReparameterization
    from bayesian_torch_tpu.parallel import mc_forward

    m = LinearReparameterization(20, 12, impl="pallas",
                                 rngs=nnx.Rngs(params=0, noise=1))
    outs, kl = mc_forward(m, jnp.ones((3, 20)), num_mc=4)
    assert outs.shape == (4, 3, 12)
    assert float(kl) > 0
