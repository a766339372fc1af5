"""Structured (vmap-free, channel-tiled) MC flipout path.

parallel.mc.mc_forward(structured=True) carries the MC axis as channel
blocks so the convs take the fast grouped form without vmap's
batching-dim transposes (doc/PROFILE_r03.md). These tests pin its math
to the reference-parity unbatched path.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from bayesian_torch_tpu.layers import Conv2dFlipout, make_rngs
from bayesian_torch_tpu.ops.conv import flipout_conv, \
    flipout_conv_structured
from bayesian_torch_tpu.parallel import mc_forward

S, B, C, O, H = 3, 2, 4, 6, 8


def _layer_params():
    rs = np.random.RandomState(0)
    mu = jnp.asarray(rs.randn(O, C, 3, 3), jnp.float32) * 0.1
    rho = jnp.asarray(rs.randn(O, C, 3, 3) - 3, jnp.float32)
    mub = jnp.asarray(rs.randn(O), jnp.float32) * 0.1
    rhob = jnp.asarray(rs.randn(O) - 3, jnp.float32)
    return mu, rho, mub, rhob


def test_structured_conv_matches_per_draw_loop():
    """Injected-noise equality: the structured op == a Python loop of
    the unbatched flipout conv over the same per-draw noise slices."""
    rs = np.random.RandomState(1)
    mu, rho, mub, rhob = _layer_params()
    x = jnp.asarray(rs.randn(B, H, H, C), jnp.float32)
    eps_k = jnp.asarray(rs.randn(S, O, C, 3, 3), jnp.float32)
    eps_b = jnp.asarray(rs.randn(S, O), jnp.float32)
    sign_in = jnp.asarray(np.sign(rs.randn(B, H, H, S * C)), jnp.float32)
    sign_out = jnp.asarray(np.sign(rs.randn(B, H, H, S * O)), jnp.float32)

    out = flipout_conv_structured(
        x, jax.random.key(0), S, mu, rho, mub, rhob, stride=1, padding=1,
        eps_k=eps_k, eps_b=eps_b, sign_in=sign_in, sign_out=sign_out)
    assert out.shape == (B, H, H, S * O)

    for s in range(S):
        ref = flipout_conv(
            x, jax.random.key(0), mu, rho, mub, rhob, stride=1,
            padding=1, data_format="NHWC", eps_k=eps_k[s], eps_b=eps_b[s],
            sign_in=sign_in[..., s * C:(s + 1) * C],
            sign_out=sign_out[..., s * O:(s + 1) * O])
        np.testing.assert_allclose(
            np.asarray(out[..., s * O:(s + 1) * O]), np.asarray(ref),
            rtol=2e-5, atol=2e-5, err_msg=f"draw {s}")


def test_structured_stem_tiles_input():
    """(B,*sp,C) stem input is tiled to S blocks internally."""
    rs = np.random.RandomState(2)
    mu, rho, mub, rhob = _layer_params()
    x = jnp.asarray(rs.randn(B, H, H, C), jnp.float32)
    eps_k = jnp.zeros((S, O, C, 3, 3))
    out = flipout_conv_structured(
        x, jax.random.key(0), S, mu, rho, mub, rhob, padding=1,
        eps_k=eps_k, eps_b=jnp.zeros((S, O)),
        sign_in=jnp.ones((B, H, H, S * C)),
        sign_out=jnp.ones((B, H, H, S * O)))
    # zero noise: every draw equals the mu conv
    for s in range(1, S):
        np.testing.assert_allclose(
            np.asarray(out[..., s * O:(s + 1) * O]),
            np.asarray(out[..., :O]), rtol=1e-6)


class _Net(nnx.Module):
    def __init__(self, rngs):
        from bayesian_torch_tpu.layers import BatchNorm2dLayer, \
            LinearFlipout
        self.conv = Conv2dFlipout(3, 8, 3, padding=1, data_format="NHWC",
                                  rngs=rngs)
        self.bn = BatchNorm2dLayer(8, data_format="NHWC", rngs=rngs)
        self.fc = LinearFlipout(8, 5, rngs=rngs)

    def eval(self):
        for _, mod in nnx.iter_modules(self):
            if hasattr(mod, "training"):
                mod.training = False

    def __call__(self, x):
        out, kl1 = self.conv(x)
        out = self.bn(nnx.relu(out))
        # global spatial pool BEFORE flatten (like the ResNets):
        # structured mode keeps the MC axis in channel blocks, so
        # flattening non-trivial spatial dims would interleave draws
        out = out.mean(axis=(1, 2))
        out, kl2 = self.fc(out)
        return out, kl1 + kl2


def test_structured_model_sigma0_equals_vmapped():
    """With sigma -> 0 every draw is the deterministic mu forward, so
    the structured and vmapped paths must agree draw-for-draw (this
    exercises conv + tiled BN + structured linear end-to-end)."""
    model = _Net(make_rngs(0, noise_seed=1))
    model.eval()
    # randomize BN stats/affine so tiling bugs can't hide
    rs = np.random.RandomState(3)
    model.bn.running_mean[...] = jnp.asarray(rs.randn(8), jnp.float32)
    model.bn.running_var[...] = jnp.asarray(
        rs.rand(8) + 0.5, jnp.float32)
    model.conv.rho_kernel[...] = model.conv.rho_kernel[...] * 0 - 25
    model.conv.rho_bias[...] = model.conv.rho_bias[...] * 0 - 25
    model.fc.rho_weight[...] = model.fc.rho_weight[...] * 0 - 25
    model.fc.rho_bias[...] = model.fc.rho_bias[...] * 0 - 25

    x = jnp.asarray(np.random.RandomState(4).randn(B, 4, 4, 3),
                    jnp.float32)
    outs_s = mc_forward(model, x, S, return_kl=False, structured=True)
    outs_v = mc_forward(model, x, S, return_kl=False)
    assert outs_s.shape == outs_v.shape == (S, B, 5)
    np.testing.assert_allclose(np.asarray(outs_s), np.asarray(outs_v),
                               rtol=2e-4, atol=2e-4)


def test_structured_model_statistics():
    """With real noise, the structured path's predictive mean agrees
    with the vmapped path within MC error (independent draws)."""
    model = _Net(make_rngs(0, noise_seed=1))
    model.eval()
    x = jnp.asarray(np.random.RandomState(5).randn(B, 4, 4, 3),
                    jnp.float32)
    n = 256
    outs_s = np.asarray(mc_forward(model, x, n, return_kl=False,
                                   structured=True))
    outs_v = np.asarray(mc_forward(model, x, n, return_kl=False))
    se = (outs_s.std(0) + outs_v.std(0)) / np.sqrt(n) + 1e-3
    diff = np.abs(outs_s.mean(0) - outs_v.mean(0))
    assert (diff < 6 * se).all(), (diff / se).max()


class _RepNet(nnx.Module):
    def __init__(self, rngs):
        from bayesian_torch_tpu.layers import (BatchNorm2dLayer,
                                               Conv2dReparameterization,
                                               LinearReparameterization)
        self.conv = Conv2dReparameterization(3, 8, 3, padding=1,
                                             data_format="NHWC",
                                             rngs=rngs)
        self.bn = BatchNorm2dLayer(8, data_format="NHWC", rngs=rngs)
        self.fc = LinearReparameterization(8, 5, rngs=rngs)

    def eval(self):
        for _, mod in nnx.iter_modules(self):
            if hasattr(mod, "training"):
                mod.training = False

    def __call__(self, x):
        out, kl1 = self.conv(x)
        out = self.bn(nnx.relu(out))
        out = out.mean(axis=(1, 2))
        out, kl2 = self.fc(out)
        return out, kl1 + kl2


def test_structured_reparam_sigma0_equals_vmapped():
    model = _RepNet(make_rngs(0, noise_seed=1))
    model.eval()
    rs = np.random.RandomState(3)
    model.bn.running_mean[...] = jnp.asarray(rs.randn(8), jnp.float32)
    model.bn.running_var[...] = jnp.asarray(rs.rand(8) + 0.5, jnp.float32)
    model.conv.rho_kernel[...] = model.conv.rho_kernel[...] * 0 - 25
    model.conv.rho_bias[...] = model.conv.rho_bias[...] * 0 - 25
    model.fc.rho_weight[...] = model.fc.rho_weight[...] * 0 - 25
    model.fc.rho_bias[...] = model.fc.rho_bias[...] * 0 - 25
    x = jnp.asarray(np.random.RandomState(4).randn(B, 4, 4, 3),
                    jnp.float32)
    outs_s = mc_forward(model, x, S, return_kl=False, structured=True)
    outs_v = mc_forward(model, x, S, return_kl=False)
    np.testing.assert_allclose(np.asarray(outs_s), np.asarray(outs_v),
                               rtol=2e-4, atol=2e-4)


def test_structured_reparam_statistics():
    model = _RepNet(make_rngs(0, noise_seed=1))
    model.eval()
    x = jnp.asarray(np.random.RandomState(5).randn(B, 4, 4, 3),
                    jnp.float32)
    n = 256
    outs_s = np.asarray(mc_forward(model, x, n, return_kl=False,
                                   structured=True))
    outs_v = np.asarray(mc_forward(model, x, n, return_kl=False))
    se = (outs_s.std(0) + outs_v.std(0)) / np.sqrt(n) + 1e-3
    diff = np.abs(outs_s.mean(0) - outs_v.mean(0))
    assert (diff < 6 * se).all(), (diff / se).max()


def _sigma0(model):
    for _, mod in nnx.iter_modules(model):
        for attr in ("rho_kernel", "rho_bias", "rho_weight"):
            if getattr(mod, attr, None) is not None:
                getattr(mod, attr)[...] = \
                    getattr(mod, attr)[...] * 0 - 25
    return model


def test_structured_train_sigma0_equals_vmapped():
    """Training mode (VERDICT r3 #3): per-draw-block batch stats + one
    EMA update. With sigma->0, structured and vmapped (bn_stats='ema')
    must agree on outputs AND on the post-forward BN running stats."""
    x = jnp.asarray(np.random.RandomState(6).randn(B, 4, 4, 3),
                    jnp.float32)
    m_s = _sigma0(_Net(make_rngs(0, noise_seed=1)))  # training=True
    m_v = _sigma0(_Net(make_rngs(0, noise_seed=1)))

    outs_s = mc_forward(m_s, x, S, return_kl=False, structured=True)
    outs_v = mc_forward(m_v, x, S, return_kl=False)
    np.testing.assert_allclose(np.asarray(outs_s), np.asarray(outs_v),
                               rtol=2e-4, atol=2e-4)
    # identical EMA semantics: draw-averaged batch stats, one update
    np.testing.assert_allclose(np.asarray(m_s.bn.running_mean[...]),
                               np.asarray(m_v.bn.running_mean[...]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_s.bn.running_var[...]),
                               np.asarray(m_v.bn.running_var[...]),
                               rtol=1e-5, atol=1e-6)
    assert int(m_s.bn.num_batches_tracked[...]) == \
        int(m_v.bn.num_batches_tracked[...]) == 1
    # the stats actually moved (the EMA applied)
    assert float(np.abs(np.asarray(m_s.bn.running_mean[...])).max()) > 0


def test_structured_train_gradients_match_vmapped():
    """sigma->0 gradient equality through the full structured train
    path (grouped convs + per-block BN batch stats + structured fc)."""
    x = jnp.asarray(np.random.RandomState(7).randn(B, 4, 4, 3),
                    jnp.float32)

    def loss_fn(model, structured):
        outs = mc_forward(model, x, S, return_kl=False,
                          structured=structured)
        return (outs.mean(0) ** 2).mean()

    m_s = _sigma0(_Net(make_rngs(0, noise_seed=1)))
    m_v = _sigma0(_Net(make_rngs(0, noise_seed=1)))
    g_s = nnx.grad(lambda m: loss_fn(m, True))(m_s)
    g_v = nnx.grad(lambda m: loss_fn(m, False))(m_v)
    flat_s = dict(nnx.to_flat_state(g_s))
    flat_v = dict(nnx.to_flat_state(g_v))
    assert flat_s.keys() == flat_v.keys()
    checked = 0
    for k, v in flat_s.items():
        path = "/".join(str(p) for p in k)
        if "mu_" in path or "weight" in path or "bias" in path:
            np.testing.assert_allclose(
                np.asarray(v[...]), np.asarray(flat_v[k][...]),
                rtol=5e-4, atol=5e-4, err_msg=path)
            checked += 1
    assert checked >= 4


def test_structured_fallback_warns():
    """The vmap fallback is logged, not silent (VERDICT r3 #3)."""
    import pytest

    from bayesian_torch_tpu.layers import ConvTranspose2dFlipout

    class TNet(nnx.Module):
        def __init__(self, rngs):
            self.deconv = ConvTranspose2dFlipout(
                3, 4, 3, data_format="NHWC", rngs=rngs)

        def __call__(self, x):
            return self.deconv(x)

    m = TNet(make_rngs(0, noise_seed=1))
    x = jnp.ones((2, 4, 4, 3), jnp.float32)
    with pytest.warns(RuntimeWarning, match="fell back"):
        outs = mc_forward(m, x, S, return_kl=False, structured=True)
    assert outs.shape[0] == S
