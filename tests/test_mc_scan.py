"""mc_forward(emission="scan"): lax.scan over the draw axis.

The scan emission runs each draw as a plain det-form forward (same HLO
per iteration as the deterministic model) instead of one 5-D vmapped
program — the round-4 flagship win (doc/PROFILE_r04.md: 134.8 -> 113.1
ms for RN50 MC-10 bs128). These tests pin its semantics against the
vmapped reference emission on CPU.

Key derivation note: both emissions split the 'noise' stream num_mc
ways via nnx.split_rngs, but the scan carries the RngCount across
iterations, so only draw 0 is bit-identical to vmap's draw 0; later
draws use the same split keys at different fold-in counts — still
independent, valid MC draws (asserted statistically here).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bayesian_torch_tpu.layers import LinearReparameterization
from bayesian_torch_tpu.models.bayesian.resnet_variational import resnet20
from bayesian_torch_tpu.parallel import make_mesh, mc_forward, shard_batch


def _resnet_and_input():
    m = resnet20(rngs=nnx.Rngs(params=jax.random.key(0),
                               noise=jax.random.key(1, impl="rbg")))
    m.eval()
    x = jax.random.normal(jax.random.key(2), (2, 3, 32, 32))
    return m, x


def _run(m, x, num_mc, emission, return_kl=True, presample="auto"):
    gd, st = nnx.split(m)

    @jax.jit
    def f(st, x):
        return mc_forward(nnx.merge(gd, st), x, num_mc,
                          return_kl=return_kl, emission=emission,
                          presample=presample)

    return f(st, x)


def test_scan_matches_vmap_draw0_and_kl():
    # presample="off" for the bit-parity half: the default presampled
    # scan draws all (S, ...) weights outside the loop with a different
    # key-consumption order, so only the in-body variant shares vmap's
    # draw-0 key stream
    m, x = _resnet_and_input()
    o_v, kl_v = _run(m, x, 4, "vmap")
    o_s, kl_s = _run(m, x, 4, "scan", presample="off")
    assert o_s.shape == o_v.shape == (4, 2, 10)
    # draw 0 consumes the identical split key at count 0 in both
    # emissions -> same draw up to fusion-order float noise
    np.testing.assert_allclose(np.asarray(o_v[0]), np.asarray(o_s[0]),
                               rtol=1e-4, atol=1e-3)
    # KL is a function of parameters only -> exactly equal
    np.testing.assert_allclose(float(kl_v), float(kl_s), rtol=1e-6)


def test_scan_presampled_default_semantics():
    # the default presampled scan (presample="auto" -> "xla"): same
    # shapes and KL as the in-body variant, distinct independent draws,
    # and no Presampled residue left on the layers afterwards
    m, x = _resnet_and_input()
    o_p, kl_p = _run(m, x, 4, "scan")  # auto -> presampled
    o_i, kl_i = _run(m, x, 4, "scan", presample="off")
    assert o_p.shape == o_i.shape == (4, 2, 10)
    np.testing.assert_allclose(float(kl_p), float(kl_i), rtol=1e-6)
    for i in range(1, 4):
        assert np.abs(np.asarray(o_p[i] - o_p[0])).max() > 1e-3
    for _, mod in nnx.iter_modules(m):
        assert getattr(mod, "_presampled_w", None) is None
        assert getattr(mod, "_presampled_b", None) is None


def test_scan_presampled_moments_match_in_body():
    # presampled and in-body draws come from the same posterior: the
    # MC means over many draws must agree
    from bayesian_torch_tpu.layers import LinearReparameterization as L

    m = L(6, 4, posterior_rho_init=-2.0, rngs=nnx.Rngs(params=0, noise=1))
    x = jnp.ones((1, 6))
    o_p = _run(m, x, 1500, "scan", return_kl=False)
    o_i = _run(m, x, 1500, "scan", return_kl=False, presample="off")
    np.testing.assert_allclose(np.asarray(o_p).mean(0),
                               np.asarray(o_i).mean(0), atol=0.1)
    np.testing.assert_allclose(np.asarray(o_p).std(0),
                               np.asarray(o_i).std(0), atol=0.1)


def test_scan_draws_are_distinct():
    m, x = _resnet_and_input()
    o_s = _run(m, x, 4, "scan", return_kl=False)
    for i in range(1, 4):
        assert np.abs(np.asarray(o_s[i] - o_s[0])).max() > 1e-3


def test_scan_moments_match_mean_forward():
    m = LinearReparameterization(6, 4, posterior_rho_init=-2.0,
                                 rngs=nnx.Rngs(params=0, noise=1))
    x = jnp.ones((1, 6))
    outs = _run(m, x, 2000, "scan", return_kl=False)
    mu_fwd = np.asarray(x) @ np.asarray(m.mu_weight[...]).T + np.asarray(
        m.mu_bias[...])
    np.testing.assert_allclose(np.asarray(outs).mean(0), mu_fwd, atol=0.07)


def test_scan_presampled_flipout():
    # flipout under the default scan (round-5 semantics): the RAW eps is
    # presampled outside the loop (_presampled_eps) while the delta
    # build (sigma*eps) and the iota signs stay in-body on the fused
    # fast path — presampling the DELTA instead measured 513 vs 257 ms
    # (parallel/mc.py). Draws must be distinct, centered on the mean
    # forward, and leave no presample residue.
    from bayesian_torch_tpu.layers import LinearFlipout

    m = LinearFlipout(6, 4, posterior_rho_init=-2.0,
                      rngs=nnx.Rngs(params=0, noise=1))
    x = jnp.ones((3, 6))
    outs = _run(m, x, 600, "scan", return_kl=False)
    assert outs.shape == (600, 3, 4)
    assert np.abs(np.asarray(outs[1] - outs[0])).max() > 1e-4
    mu_fwd = np.asarray(x) @ np.asarray(m.mu_weight[...]).T + np.asarray(
        m.mu_bias[...])
    np.testing.assert_allclose(np.asarray(outs).mean(0), mu_fwd, atol=0.1)
    assert getattr(m, "_presampled_eps", None) is None
    assert getattr(m, "_presampled_eps_b", None) is None


def test_scan_deterministic_given_state():
    m, x = _resnet_and_input()
    o1 = _run(m, x, 3, "scan", return_kl=False)
    o2 = _run(m, x, 3, "scan", return_kl=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_scan_training_bn_falls_back_with_warning():
    # training-mode BN: scan can't carry the EMA stats -> logged
    # fallback to the vmapped emission (same math), not an error and
    # not silent (mirrors the structured-path fallback contract)
    m, x = _resnet_and_input()
    m.train()
    with pytest.warns(RuntimeWarning, match="fell back to the "):
        o, kl = mc_forward(m, x, 4, emission="scan")
    assert o.shape == (4, 2, 10)

    # the internal scan path itself still raises (direct callers)
    from bayesian_torch_tpu.parallel.mc import _mc_forward_scan
    with pytest.raises(NotImplementedError, match="eval-only"):
        _mc_forward_scan(m, x, 4, True)


def test_scan_frozen_bn_training_allowed():
    # freeze_batchnorm puts BN in eval mode -> the scan guard passes
    # and gradients flow through the draw loop (frozen-stat training)
    import optax

    from bayesian_torch_tpu.utils import freeze_batchnorm

    m, x = _resnet_and_input()
    m.train()
    assert freeze_batchnorm(m) > 0
    y = jnp.zeros((2,), jnp.int32)
    gd, st = nnx.split(m)

    @jax.jit
    def loss_and_grad(st, x, y):
        model = nnx.merge(gd, st)

        def loss_fn(model):
            outs, kl = mc_forward(model, x, 2, emission="scan")
            ce = optax.softmax_cross_entropy_with_integer_labels(
                outs.mean(0), y).mean()
            return ce + kl / x.shape[0]

        return nnx.value_and_grad(loss_fn)(model)

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning expected
        loss, grads = loss_and_grad(st, x, y)
    assert jnp.isfinite(loss)
    leaves = jax.tree.leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves
               if hasattr(g, "dtype"))


def test_scan_num_mc_1_falls_through():
    # num_mc=1 routes to the plain single-forward path regardless of
    # emission (exact reference semantics incl. BN stat updates)
    m, x = _resnet_and_input()
    o, kl = _run(m, x, 1, "scan")
    assert o.shape == (1, 2, 10)
    assert kl.shape == ()


def test_flipout_presampled_eps_injection_exact():
    """_presampled_eps (scan-emission raw-eps presample, VERDICT r4 #2)
    is consumed exactly like an explicit eps_w/eps_k argument — the
    layer stays on its fused in-body path either way."""
    import numpy as np

    from bayesian_torch_tpu.layers import Conv2dFlipout, LinearFlipout
    from bayesian_torch_tpu.layers.base_variational_layer import Presampled

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 6).astype(np.float32))
    eps_w = jnp.asarray(rs.randn(4, 6).astype(np.float32))
    eps_b = jnp.asarray(rs.randn(4).astype(np.float32))
    s_in = jnp.sign(jnp.asarray(rs.randn(3, 6).astype(np.float32)))
    s_out = jnp.sign(jnp.asarray(rs.randn(3, 4).astype(np.float32)))

    m = LinearFlipout(6, 4, posterior_rho_init=-2.0,
                      rngs=nnx.Rngs(params=0, noise=1))
    o_arg = m(x, return_kl=False, eps_w=eps_w, eps_b=eps_b,
              sign_in=s_in, sign_out=s_out)
    m._presampled_eps = Presampled(eps_w)
    m._presampled_eps_b = Presampled(eps_b)
    o_attr = m(x, return_kl=False, sign_in=s_in, sign_out=s_out)
    del m._presampled_eps, m._presampled_eps_b
    np.testing.assert_array_equal(np.asarray(o_arg), np.asarray(o_attr))

    xc = jnp.asarray(rs.randn(2, 8, 8, 3).astype(np.float32))
    eps_k = jnp.asarray(rs.randn(4, 3, 3, 3).astype(np.float32))
    si = jnp.sign(jnp.asarray(rs.randn(2, 8, 8, 3).astype(np.float32)))
    so = jnp.sign(jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32)))
    c = Conv2dFlipout(3, 4, 3, padding=1, posterior_rho_init=-2.0,
                      bias=False, data_format="NHWC",
                      rngs=nnx.Rngs(params=0, noise=1))
    o_arg = c(xc, return_kl=False, eps_k=eps_k, sign_in=si, sign_out=so)
    c._presampled_eps = Presampled(eps_k)
    o_attr = c(xc, return_kl=False, sign_in=si, sign_out=so)
    del c._presampled_eps
    np.testing.assert_array_equal(np.asarray(o_arg), np.asarray(o_attr))


def test_flipout_scan_presample_runs_and_cleans_up():
    from bayesian_torch_tpu.layers import Conv2dFlipout, LinearFlipout

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv = Conv2dFlipout(3, 8, 3, padding=1,
                                      data_format="NHWC", rngs=rngs)
            self.fc = LinearFlipout(8 * 8 * 8, 10, rngs=rngs)

        def __call__(self, x):
            h, k1 = self.conv(x)
            h = h.reshape(h.shape[0], -1)
            o, k2 = self.fc(h)
            return o, k1 + k2

    m = Net(nnx.Rngs(params=0, noise=1))
    m.eval()
    x = jnp.ones((2, 8, 8, 3))
    outs = mc_forward(m, x, 4, return_kl=False, emission="scan")
    assert outs.shape == (4, 2, 10)
    assert np.abs(np.asarray(outs[0] - outs[1])).max() > 0
    assert getattr(m.conv, "_presampled_eps", None) is None
    assert getattr(m.fc, "_presampled_eps", None) is None


def test_scan_remat_policy_grads():
    """mc_forward(remat_policy=...) threads a selective checkpoint
    policy into the scan body's remat: gradients flow and match the
    full-remat gradients exactly (the policy changes what is saved,
    not the math)."""
    import optax

    def loss_grads(policy):
        m = LinearReparameterization(32, 16, posterior_rho_init=-2.0,
                                     rngs=nnx.Rngs(params=0, noise=1))
        m.eval()
        x = jnp.ones((4, 32))
        y = jnp.zeros((4,), jnp.int32)
        gd, st = nnx.split(m)

        @jax.jit
        def f(st, x, y):
            model = nnx.merge(gd, st)

            def loss_fn(model):
                outs, kl = mc_forward(model, x, 3, emission="scan",
                                      remat_policy=policy)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    outs.mean(0), y).mean()
                return ce + kl / x.shape[0]

            return nnx.value_and_grad(loss_fn)(model)

        return f(st, x, y)

    pol = jax.checkpoint_policies.save_only_these_names("conv_out")
    l1, g1 = loss_grads(None)
    l2, g2 = loss_grads(pol)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        if hasattr(a, "dtype"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_scan_presample_hash_generator():
    """presample='hash' (counter-hash Box-Muller generator in the scan
    presample slot) produces valid, distinct, well-moment'd draws."""
    m = LinearReparameterization(64, 32, posterior_rho_init=-2.0,
                                 rngs=nnx.Rngs(params=0, noise=1))
    m.eval()
    x = jnp.ones((4, 64))
    outs = mc_forward(m, x, 400, return_kl=False, emission="scan",
                      presample="hash")
    assert outs.shape == (400, 4, 32)
    assert np.abs(np.asarray(outs[0] - outs[1])).max() > 0
    mu_fwd = np.asarray(x) @ np.asarray(m.mu_weight[...]).T + np.asarray(
        m.mu_bias[...])
    np.testing.assert_allclose(np.asarray(outs).mean(0), mu_fwd,
                               atol=0.15)
    assert getattr(m, "_presampled_w", None) is None


def test_scan_int8_presampled_weight_build():
    """INT8 layers under the scan emission presample the quantized
    weight BUILD (VERDICT r4 #3): with sigma -> 0 the built weight is
    draw-independent, so the presampled-scan output exactly equals the
    in-body (presample='off') output; and with real sigma the draws
    stay distinct."""
    import numpy as np

    from bayesian_torch_tpu.layers import (Conv2dReparameterization,
                                           LinearReparameterization)
    from bayesian_torch_tpu.quantization import convert, prepare

    class Net(nnx.Module):
        def __init__(self, rngs, rho=-100.0):
            self.conv = Conv2dReparameterization(
                3, 8, 3, padding=1, posterior_rho_init=rho, rngs=rngs)
            self.fc = LinearReparameterization(
                8 * 8 * 8, 10, posterior_rho_init=rho, rngs=rngs)

        def __call__(self, x):
            h, k1 = self.conv(x)
            h = h.reshape(h.shape[0], -1)
            o, k2 = self.fc(h)
            return o, k1 + k2

    def build(rho):
        net = Net(nnx.Rngs(params=0, noise=1), rho=rho)
        xcal = jnp.asarray(np.random.RandomState(0).randn(
            4, 3, 8, 8).astype(np.float32))
        prepare(net)
        for i in range(3):
            net(xcal + 0.1 * i)
        convert(net)
        return net

    x = jnp.asarray(np.random.RandomState(1).randn(
        4, 3, 8, 8).astype(np.float32))

    # sigma ~ 0: presampled build == in-body build exactly
    o_pre = np.asarray(mc_forward(build(-100.0), x, 3, return_kl=False,
                                  emission="scan"))
    o_off = np.asarray(mc_forward(build(-100.0), x, 3, return_kl=False,
                                  emission="scan", presample="off"))
    assert o_pre.shape == (3, 4, 10)
    np.testing.assert_array_equal(o_pre, o_off)

    # real sigma: draws distinct, presample attrs cleaned up
    net = build(-2.0)
    outs = np.asarray(mc_forward(net, x, 3, return_kl=False,
                                 emission="scan"))
    assert np.abs(outs[0] - outs[1]).max() > 0
    assert getattr(net.conv, "_presampled_qw", None) is None
    assert not hasattr(net.conv, "_presampled_qscale")


def test_scan_int8_uncalibrated_and_normal_scale_fallback():
    """The UNCALIBRATED (bnn_to_qbnn, no quant_dict) int8 path under
    the scan emission: presampled weight builds run and match the
    in-body variant at sigma -> 0; and a call-time normal_scale that
    differs from the presample's 6/255 falls back to the in-body build
    (the presampled int8 grid bakes normal_scale in — consuming it at a
    different scale would be silently wrong)."""
    import numpy as np

    from bayesian_torch_tpu.layers import LinearReparameterization as L
    from bayesian_torch_tpu.models.bnn_to_qbnn import bnn_to_qbnn
    from bayesian_torch_tpu.parallel.mc import _presample_layers_xla

    class Net(nnx.Module):
        def __init__(self, rngs, rho=-100.0):
            self.fc1 = L(6, 16, posterior_rho_init=rho, rngs=rngs)
            self.fc2 = L(16, 4, posterior_rho_init=rho, rngs=rngs)

        def __call__(self, x):
            h, k1 = self.fc1(x)
            o, k2 = self.fc2(jax.nn.relu(h))
            return o, k1 + k2

    def build(rho):
        net = Net(nnx.Rngs(params=0, noise=1), rho=rho)
        bnn_to_qbnn(net)
        return net

    x = jnp.asarray(np.random.RandomState(1).randn(3, 6)
                    .astype(np.float32))
    o_pre = np.asarray(mc_forward(build(-100.0), x, 3, return_kl=False,
                                  emission="scan"))
    o_off = np.asarray(mc_forward(build(-100.0), x, 3, return_kl=False,
                                  emission="scan", presample="off"))
    assert o_pre.shape == (3, 3, 4)
    np.testing.assert_array_equal(o_pre, o_off)

    # normal_scale mismatch: layer must NOT consume the 6/255 presample.
    # Routing is tested by POISONING the presampled weight with zeros —
    # numeric comparison between the two paths is flaky by construction
    # (different int8 grids round borderline values one output-grid
    # step apart even at sigma -> 0).
    net = build(-100.0)
    touched = _presample_layers_xla(net, 2)
    assert touched  # quantized layers were presampled
    layer = net.fc1
    # the presampled tensors carry a leading (S, ...) draw axis that the
    # scan normally slices; calling the layer directly, pin draw 0 and
    # zero the weight so consuming it is unmistakable
    layer._presampled_qw = type(layer._presampled_qw)(
        jnp.zeros_like(layer._presampled_qw[...][0]))
    if getattr(layer, "_presampled_qbias", None) is not None:
        layer._presampled_qbias = type(layer._presampled_qbias)(
            layer._presampled_qbias[...][0])
    o_match = layer(x, normal_scale=6 / 255)
    o_other = layer(x, normal_scale=0.1)
    o_match = np.asarray(o_match[0] if isinstance(o_match, tuple)
                         else o_match)
    o_other = np.asarray(o_other[0] if isinstance(o_other, tuple)
                         else o_other)
    # matching scale consumed the zeroed presample: output is bias-only,
    # identical for every input row
    np.testing.assert_array_equal(o_match[0], o_match[1])
    np.testing.assert_array_equal(o_match[0], o_match[2])
    # mismatched scale fell back to the in-body build: real weights,
    # input-dependent rows
    assert np.abs(o_other[0] - o_other[1]).max() > 0
    for lyr, attrs in touched:
        for a in attrs:
            if hasattr(lyr, a):
                delattr(lyr, a)


def test_mc_forward_presample_validation():
    m = LinearReparameterization(6, 4, rngs=nnx.Rngs(params=0, noise=1))
    x = jnp.ones((2, 6))
    with pytest.raises(ValueError, match="presample"):
        mc_forward(m, x, 4, presample="pallas")
    with pytest.raises(ValueError, match="presample"):
        mc_forward(m, x, 4, emission="scan", presample="xLa")


def test_vmap_presample_hash_generator():
    """presample='hash' under the VMAPPED emission routes through the
    counter-hash generator (round-5: previously silently ignored)."""
    m = LinearReparameterization(16, 8, posterior_rho_init=-2.0,
                                 rngs=nnx.Rngs(params=0, noise=1))
    m.eval()
    x = jnp.ones((2, 16))
    outs = mc_forward(m, x, 400, return_kl=False, emission="vmap",
                      presample="hash")
    assert outs.shape == (400, 2, 8)
    assert np.abs(np.asarray(outs[0] - outs[1])).max() > 0
    mu_fwd = np.asarray(x) @ np.asarray(m.mu_weight[...]).T + np.asarray(
        m.mu_bias[...])
    np.testing.assert_allclose(np.asarray(outs).mean(0), mu_fwd,
                               atol=0.15)
    assert getattr(m, "_presampled_w", None) is None


def test_scan_reduce_mean_mesh_sharded():
    """mesh + emission='scan' + reduce='mean': the (B, ...) mean keeps
    the 'data' sharding contract (round-5 fix: the early return used to
    skip the constraint entirely)."""
    mesh = make_mesh(mc=4, data=2)
    m = LinearReparameterization(6, 4, rngs=nnx.Rngs(params=0, noise=1))
    x = shard_batch(jnp.ones((4, 6)), mesh)

    @nnx.jit
    def run(m, x):
        return mc_forward(m, x, num_mc=4, mesh=mesh, emission="scan",
                          reduce="mean")

    with mesh:
        outs, kl = run(m, x)
    assert outs.shape == (4, 4)
    assert len(outs.sharding.device_set) >= 2


def test_scan_sharded_output():
    mesh = make_mesh(mc=4, data=2)
    m = LinearReparameterization(6, 4, rngs=nnx.Rngs(params=0, noise=1))
    x = shard_batch(jnp.ones((4, 6)), mesh)

    @nnx.jit
    def run(m, x):
        return mc_forward(m, x, num_mc=4, mesh=mesh, emission="scan")

    with mesh:
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no silent-fallback warnings
            outs, kl = run(m, x)
    assert outs.shape == (4, 4, 4)
    assert len(outs.sharding.device_set) == 8
