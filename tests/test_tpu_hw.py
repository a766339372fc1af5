"""Hardware (-m tpu) lane: Pallas distribution/moment checks and
kernel-vs-XLA equivalence on the real chip.

Interpret mode stubs the TPU PRNG to constant bits, so CPU tests can
only validate plumbing/algebra; the statistical evidence that used to
live only in BASELINE.md prose is made repeatable here (VERDICT
round-1 item 10). Run: ``BTT_TPU_TESTS=1 python -m pytest tests/ -m tpu``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")


def test_batch_sampler_moments():
    """K1 batch sampler: per-draw values are N(mu, sigma^2), draws are
    independent across the MC axis."""
    _require_tpu()
    from bayesian_torch_tpu.ops.pallas import sample_scaled_normals_batch

    n = 1 << 16
    mu = jnp.full((n,), 0.7, jnp.float32)
    sigma = jnp.full((n,), 0.3, jnp.float32)
    w = np.asarray(sample_scaled_normals_batch(
        jax.random.key(0), mu, sigma, 8, jnp.float32))
    assert w.shape == (8, n)
    z = (w - 0.7) / 0.3
    assert abs(z.mean()) < 0.01
    assert abs(z.std() - 1.0) < 0.01
    assert abs((z ** 3).mean()) < 0.05          # skewness ~ 0
    assert abs((z ** 4).mean() - 3.0) < 0.15    # kurtosis ~ 3
    # draws decorrelated across the MC axis
    c = np.corrcoef(z[0], z[1])[0, 1]
    assert abs(c) < 0.02


def test_sampled_matmul_eps_distribution_and_determinism():
    """K1 GEMM kernel: implied eps is standard normal; same seed gives
    identical results across calls (regenerate-eps contract)."""
    _require_tpu()
    from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
        sampled_matmul_pallas,
    )

    K, N = 512, 384
    mu = jnp.zeros((N, K), jnp.float32)
    rho = jnp.full((N, K), 0.5413, jnp.float32)  # softplus ~ 1.0
    probe = jnp.eye(K, dtype=jnp.float32)
    key = jax.random.key(5)
    W1 = np.asarray(sampled_matmul_pallas(key, probe, mu, rho,
                                          out_dtype=jnp.float32)).T
    W2 = np.asarray(sampled_matmul_pallas(key, probe, mu, rho,
                                          out_dtype=jnp.float32)).T
    np.testing.assert_array_equal(W1, W2)  # deterministic per seed
    sigma = float(jax.nn.softplus(0.5413))
    eps = W1 / sigma
    assert abs(eps.mean()) < 0.01
    assert abs(eps.std() - 1.0) < 0.01
    # different key -> different draw
    W3 = np.asarray(sampled_matmul_pallas(jax.random.key(6), probe, mu,
                                          rho, out_dtype=jnp.float32)).T
    assert np.abs(W1 - W3).max() > 0.1


def test_sampled_matmul_matches_xla_with_same_weights():
    """Kernel-vs-XLA equivalence: extract the kernel's implied sampled
    W, then the kernel's GEMM must match XLA's x @ W^T."""
    _require_tpu()
    from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
        sampled_matmul_pallas,
    )

    rs = np.random.RandomState(0)
    K, N, M = 512, 256, 128
    mu = jnp.asarray(rs.randn(N, K).astype(np.float32) * 0.2)
    rho = jnp.asarray(rs.randn(N, K).astype(np.float32) - 2)
    x = jnp.asarray(rs.randn(M, K).astype(np.float32))
    key = jax.random.key(3)
    W = np.asarray(sampled_matmul_pallas(key, jnp.eye(K), mu, rho,
                                         out_dtype=jnp.float32)).T
    out = np.asarray(sampled_matmul_pallas(key, x, mu, rho,
                                           out_dtype=jnp.float32))
    ref = np.asarray(x) @ W.T
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_sampled_matmul_vmap_lane_equality_on_hw():
    """S-batched kernel: lane s == unbatched call with keys[s] (the
    per-tile seeding contract), on real PRNG bits."""
    _require_tpu()
    from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
        sampled_matmul_pallas,
    )

    rs = np.random.RandomState(1)
    K, N, M = 384, 256, 64
    mu = jnp.asarray(rs.randn(N, K).astype(np.float32) * 0.2)
    rho = jnp.asarray(rs.randn(N, K).astype(np.float32) - 2)
    x = jnp.asarray(rs.randn(M, K).astype(np.float32))
    keys = jax.random.split(jax.random.key(9), 4)
    outs = jax.vmap(lambda k: sampled_matmul_pallas(
        k, x, mu, rho, out_dtype=jnp.float32))(keys)
    for s in range(4):
        ref = sampled_matmul_pallas(keys[s], x, mu, rho,
                                    out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(outs[s]), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
    # and the lanes are distinct draws
    assert np.abs(np.asarray(outs[0]) - np.asarray(outs[1])).max() > 1e-3


def test_sampled_matmul_grad_moments_on_hw():
    """Regenerate-eps VJP: E[d rho] over draws ~ the analytic value for
    a quadratic loss (checks the backward regenerates the SAME eps)."""
    _require_tpu()
    from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
        sampled_matmul_pallas,
    )

    K = N = 256
    mu = jnp.zeros((N, K), jnp.float32)
    rho = jnp.full((N, K), 0.5413, jnp.float32)  # sigma ~ 1
    x = jnp.eye(K, dtype=jnp.float32)

    def loss(rho, key):
        out = sampled_matmul_pallas(key, x, mu, rho,
                                    out_dtype=jnp.float32)
        return 0.5 * (out ** 2).sum()

    # out = sigma*eps (mu=0, x=I) -> dloss/dsigma = sigma*eps^2;
    # E[eps^2]=1 so E[grad_rho] = sigma * d sigma/d rho
    g = np.asarray(jax.grad(loss)(rho, jax.random.key(11)))
    sig_grad = float(jax.nn.sigmoid(0.5413))
    sigma = float(jax.nn.softplus(0.5413))
    assert abs(g.mean() - sigma * sig_grad) < 0.02
    assert np.isfinite(g).all()


def test_rademacher_fused_distribution():
    """Counter-hash sign generator (Flipout hot path): exactly +-1,
    balanced, decorrelated between keys."""
    _require_tpu()
    from bayesian_torch_tpu.ops.sampling import rademacher_fused

    s1 = np.asarray(rademacher_fused(jax.random.key(0), (1 << 16,),
                                     jnp.float32))
    s2 = np.asarray(rademacher_fused(jax.random.key(1), (1 << 16,),
                                     jnp.float32))
    assert set(np.unique(s1)) == {-1.0, 1.0}
    assert abs(s1.mean()) < 0.02
    assert abs((s1 * s2).mean()) < 0.02  # independent streams


def test_int8_qlinear_mxu_path():
    """s8 x u8 -> s32 MXU GEMM matches the float computation within one
    output quantum on hardware."""
    _require_tpu()
    from bayesian_torch_tpu.ops import int8 as q

    rs = np.random.RandomState(2)
    x = rs.randn(32, 256).astype(np.float32)
    w = (rs.randn(128, 256) * 0.4).astype(np.float32)
    b = rs.randn(128).astype(np.float32)
    x_scale, x_zp = 0.05, 128
    w_scale = float(q.symmetric_scale(jnp.asarray(w)))
    out_scale, out_zp = 0.2, 128

    xq = q.quantize_uint8(jnp.asarray(x), x_scale, x_zp)
    wq = q.quantize_int8(jnp.asarray(w), w_scale)
    out = np.asarray(q.dequantize(
        q.qlinear(xq, x_scale, x_zp, wq, w_scale, jnp.asarray(b),
                  out_scale, out_zp), out_scale, out_zp))
    # float reference on the DEQUANTIZED operands (isolates the int8
    # GEMM from input-quantization error)
    x_dq = (np.asarray(xq, np.float32) - x_zp) * x_scale
    w_dq = np.asarray(wq, np.float32) * w_scale
    ref = np.clip(np.round((x_dq @ w_dq.T + b) / out_scale) + out_zp,
                  0, 255)
    ref = (ref - out_zp) * out_scale
    np.testing.assert_allclose(out, ref, atol=out_scale + 1e-6)


def test_mc_forward_bn_ema_on_hw():
    """The vmap-native BN EMA works on the real backend too."""
    _require_tpu()
    from bayesian_torch_tpu.layers import (BatchNorm2dLayer,
                                           Conv2dReparameterization)
    from bayesian_torch_tpu.parallel import mc_forward

    class M(nnx.Module):
        def __init__(self, rngs):
            self.conv = Conv2dReparameterization(3, 8, 3, padding=1,
                                                 rngs=rngs)
            self.bn = BatchNorm2dLayer(8)

        def __call__(self, x):
            out, kl = self.conv(x)
            out, _ = self.bn((out, 0))
            return out, kl

    m = M(nnx.Rngs(params=0, noise=1))
    x = jax.random.normal(jax.random.key(0), (4, 3, 8, 8))
    mc_forward(m, x, num_mc=4)
    assert int(m.bn.num_batches_tracked[...]) == 1
    assert float(jnp.abs(m.bn.running_mean[...]).sum()) > 0


def test_qmatmul_pallas_matches_xla_on_hw():
    """K4 fused GEMM+requant kernel vs the XLA int8 path on the chip."""
    _require_tpu()
    from bayesian_torch_tpu.ops import int8 as q

    rs = np.random.RandomState(0)
    M, K, N = 512, 256, 384
    x = rs.randn(M, K).astype(np.float32)
    w = (rs.randn(N, K) * 0.4).astype(np.float32)
    b = rs.randn(N).astype(np.float32)
    ws = float(q.symmetric_scale(jnp.asarray(w)))
    xq = q.quantize_uint8(jnp.asarray(x), 0.05, 117)
    wq = q.quantize_int8(jnp.asarray(w), ws)

    old = q.USE_PALLAS_QMATMUL
    try:
        q.USE_PALLAS_QMATMUL = True
        got = np.asarray(q.qlinear(xq, 0.05, 117, wq, ws,
                                   jnp.asarray(b), 0.1, 128))
        q.USE_PALLAS_QMATMUL = False
        ref = np.asarray(q.qlinear(xq, 0.05, 117, wq, ws,
                                   jnp.asarray(b), 0.1, 128))
    finally:
        q.USE_PALLAS_QMATMUL = old
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.001


def test_qtensor_flow_matches_fp32_flow_on_hw():
    """QTensor uint8 activation flow vs fp32 round-trip flow on the
    real chip (SCNN: no residual adds, so bit-identical logits)."""
    _require_tpu()
    from bayesian_torch_tpu.models.bayesian.simple_cnn_variational import (
        SCNN,
    )
    from bayesian_torch_tpu.quantization import convert, prepare

    x = jnp.asarray(np.random.RandomState(4).randn(4, 1, 28, 28)
                    .astype(np.float32))
    outs = []
    for qa in (False, True):
        m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
        m.eval()
        prepare(m)
        convert(m, quantize_activations=qa)
        gd, st = nnx.split(m)

        @jax.jit
        def fwd(st, x):
            mm = nnx.merge(gd, st)
            out, _ = mm(x)
            return out

        outs.append(np.asarray(fwd(st, x)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_im2col_qconv_matches_xla_on_hw():
    """uint8 im2col + fused Pallas GEMM vs XLA conv formulation, on
    hardware (CPU lane runs this in interpret mode only)."""
    _require_tpu()
    from bayesian_torch_tpu.ops import int8 as q

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(0, 256, (2, 14, 14, 16)), jnp.uint8)
    w = jnp.asarray(rs.randint(-128, 128, (32, 16, 3, 3)), jnp.int8)
    b = jnp.asarray(rs.randn(32).astype(np.float32))
    old = (q.USE_PALLAS_QMATMUL, q.USE_INT8_IM2COL)
    try:
        q.USE_PALLAS_QMATMUL = False
        ref = q.qconv(x, 0.05, 120, w, 0.01, b, 0.1, 128, stride=2,
                      padding=1, data_format="NHWC")
        q.USE_PALLAS_QMATMUL = True
        q.USE_INT8_IM2COL = True
        got = q.qconv(x, 0.05, 120, w, 0.01, b, 0.1, 128, stride=2,
                      padding=1, data_format="NHWC")
    finally:
        q.USE_PALLAS_QMATMUL, q.USE_INT8_IM2COL = old
    d = np.abs(np.asarray(ref, np.int32) - np.asarray(got, np.int32)).max()
    assert d <= 1, d


def _small_bayes_net(rho=-2.0):
    from bayesian_torch_tpu.layers import (Conv2dReparameterization,
                                           LinearReparameterization,
                                           make_rngs)

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv = Conv2dReparameterization(
                3, 16, 1, posterior_rho_init=rho, data_format="NHWC",
                rngs=rngs)
            self.fc = LinearReparameterization(
                16, 5, posterior_rho_init=rho, rngs=rngs)

        def __call__(self, x):
            out, kl1 = self.conv(x)
            out = out.mean(axis=(1, 2))
            out, kl2 = self.fc(out)
            return out, kl1 + kl2

    return Net(make_rngs(0, noise_seed=1))


def test_scan_vs_vmap_sigma0_equality_on_hw():
    """Round-4 scan emission vs vmap on the real chip: with sigma -> 0
    both reduce to the mu forward, so every draw is equal bitwise-ish
    regardless of key consumption differences."""
    _require_tpu()
    from bayesian_torch_tpu.parallel import mc_forward

    model = _small_bayes_net(rho=-25.0)
    gd, st = nnx.split(model)
    x = jax.random.normal(jax.random.key(5), (8, 8, 8, 3))

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(st, x, emission):
        return mc_forward(nnx.merge(gd, st), x, 4, return_kl=False,
                          emission=emission)

    a = np.asarray(run(st, x, "scan"))
    b = np.asarray(run(st, x, "vmap"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_scan_presampled_draw_moments_on_hw():
    """Presampled-scan draws (round-4/5 flagship path, incl. the
    squeezed-shape generation) have the right predictive mean on the
    real chip; the hash generator too."""
    _require_tpu()
    from bayesian_torch_tpu.parallel import mc_forward

    x = jnp.ones((2, 4, 4, 3))
    for ps in ("xla", "hash"):
        model = _small_bayes_net(rho=-2.0)
        outs = np.asarray(mc_forward(model, x, 400, return_kl=False,
                                     emission="scan", presample=ps))
        model2 = _small_bayes_net(rho=-25.0)
        mu_fwd = np.asarray(mc_forward(model2, x, 1,
                                       return_kl=False)[0])
        assert np.abs(outs[0] - outs[1]).max() > 0
        np.testing.assert_allclose(outs.mean(0), mu_fwd, atol=0.12)


def test_scan_reduce_mean_matches_stacked_on_hw():
    """reduce='mean' (mean in the scan carry) equals mean(stacked) on
    the real chip, draw for draw (same cloned RNG state)."""
    _require_tpu()
    from bayesian_torch_tpu.parallel import mc_forward

    x = jax.random.normal(jax.random.key(2), (4, 8, 8, 3))
    m1 = _small_bayes_net(rho=-2.0)
    stacked = np.asarray(
        mc_forward(nnx.clone(m1), x, 6, return_kl=False,
                   emission="scan")).astype(np.float32)
    mean = np.asarray(mc_forward(nnx.clone(m1), x, 6, return_kl=False,
                                 emission="scan", reduce="mean"))
    np.testing.assert_allclose(stacked.mean(0), mean, rtol=2e-3,
                               atol=2e-3)


def test_frozen_bn_scan_train_step_on_hw():
    """Frozen-stat BN training through the scan emission: gradients
    flow and are finite on the real chip (round-4 path)."""
    _require_tpu()
    import optax

    from bayesian_torch_tpu.layers import (BatchNorm2dLayer,
                                           Conv2dReparameterization,
                                           make_rngs)
    from bayesian_torch_tpu.parallel import mc_forward
    from bayesian_torch_tpu.utils import freeze_batchnorm

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv = Conv2dReparameterization(
                3, 8, 3, padding=1, data_format="NHWC", rngs=rngs)
            self.bn = BatchNorm2dLayer(8, data_format="NHWC", rngs=rngs)

        def __call__(self, x):
            out, kl = self.conv(x)
            out = nnx.relu(self.bn(out))
            return out.mean(axis=(1, 2, 3))[:, None] * jnp.ones((1, 4)), kl

    m = Net(make_rngs(0, noise_seed=1))
    m.train()
    m.bn.running_mean[...] = jnp.ones((8,)) * 0.1
    assert freeze_batchnorm(m) == 1
    y = jnp.zeros((4,), jnp.int32)
    x = jax.random.normal(jax.random.key(3), (4, 8, 8, 3))
    gd, st = nnx.split(m)

    @jax.jit
    def grads(st, x, y):
        model = nnx.merge(gd, st)

        def loss_fn(model):
            outs, kl = mc_forward(model, x, 2, emission="scan")
            ce = optax.softmax_cross_entropy_with_integer_labels(
                outs.mean(0), y).mean()
            return ce + kl / x.shape[0]

        return nnx.value_and_grad(loss_fn)(model)

    loss, g = grads(st, x, y)
    assert np.isfinite(float(loss))
    leaves = [np.asarray(v) for v in jax.tree.leaves(g)
              if hasattr(v, "dtype")]
    assert any(np.abs(v).max() > 0 for v in leaves)


def test_flipout_frozen_delta_serving_on_hw():
    """freeze_quantized_draws on a quantized flipout layer: the delta
    draw is pinned (repeated calls share it) while the Rademacher signs
    stay per-call — outputs differ across calls but agree under
    sigma -> 0 (round-3/4 serving path, certified on chip)."""
    _require_tpu()
    from bayesian_torch_tpu.layers import LinearFlipout, make_rngs
    from bayesian_torch_tpu.quantization import (freeze_quantized_draws,
                                                 prepare, convert)

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.fc = LinearFlipout(16, 8, posterior_rho_init=-25.0,
                                    rngs=rngs)

        def __call__(self, x):
            return self.fc(x)

    net = Net(make_rngs(0, noise_seed=1))
    net.eval()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16)
                    .astype(np.float32))
    prepare(net)
    net(x)
    convert(net)
    ref, _ = net(x)
    n = freeze_quantized_draws(net)
    assert n == 1
    o1, _ = net(x)
    o2, _ = net(x)
    # sigma ~ 0: frozen delta ~ 0, so all calls match the mean path
    np.testing.assert_allclose(np.asarray(o1), np.asarray(ref),
                               atol=0.35)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=0.35)


def test_int8_scan_presampled_build_on_hw():
    """INT8 scan presample (round 5): sigma->0 makes the presampled
    quantized weight build draw-independent — equality with the
    in-body build on the real chip."""
    _require_tpu()
    from bayesian_torch_tpu.layers import (Conv2dReparameterization,
                                           LinearReparameterization,
                                           make_rngs)
    from bayesian_torch_tpu.parallel import mc_forward
    from bayesian_torch_tpu.quantization import convert, prepare

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv = Conv2dReparameterization(
                3, 8, 3, padding=1, posterior_rho_init=-100.0,
                data_format="NHWC", rngs=rngs)
            self.fc = LinearReparameterization(
                8, 10, posterior_rho_init=-100.0, rngs=rngs)

        def __call__(self, x):
            h, k1 = self.conv(x)
            h = h.mean(axis=(1, 2))
            o, k2 = self.fc(h)
            return o, k1 + k2

    def build():
        net = Net(make_rngs(0, noise_seed=1))
        net.eval()
        xcal = jnp.asarray(np.random.RandomState(0).randn(
            4, 8, 8, 3).astype(np.float32))
        prepare(net)
        for i in range(3):
            net(xcal + 0.1 * i)
        convert(net)
        return net

    x = jnp.asarray(np.random.RandomState(1).randn(4, 8, 8, 3)
                    .astype(np.float32))
    o_pre = np.asarray(mc_forward(build(), x, 3, return_kl=False,
                                  emission="scan"))
    o_off = np.asarray(mc_forward(build(), x, 3, return_kl=False,
                                  emission="scan", presample="off"))
    np.testing.assert_array_equal(o_pre, o_off)


def test_structured_flipout_matches_vmapped_on_hw():
    """Structured (vmap-free) flipout path: sigma->0 draw-for-draw
    equality vs the vmapped path on the real chip (the CPU suite also
    checks this, but the structured path is the flagship Flipout
    mechanism — it must hold under the real Mosaic/XLA toolchain)."""
    _require_tpu()
    import numpy as np

    from bayesian_torch_tpu.layers import (
        BatchNorm2dLayer,
        Conv2dFlipout,
        LinearFlipout,
        make_rngs,
    )
    from bayesian_torch_tpu.parallel import mc_forward

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv = Conv2dFlipout(3, 16, 3, padding=1,
                                      data_format="NHWC", rngs=rngs)
            self.bn = BatchNorm2dLayer(16, data_format="NHWC", rngs=rngs)
            self.fc = LinearFlipout(16, 5, rngs=rngs)

        def __call__(self, x):
            out, kl1 = self.conv(x)
            out = self.bn(nnx.relu(out))
            out = out.mean(axis=(1, 2))
            out, kl2 = self.fc(out)
            return out, kl1 + kl2

    model = Net(make_rngs(0, noise_seed=1))
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "training"):
            mod.training = False
    model.conv.rho_kernel[...] = model.conv.rho_kernel[...] * 0 - 25
    model.conv.rho_bias[...] = model.conv.rho_bias[...] * 0 - 25
    model.fc.rho_weight[...] = model.fc.rho_weight[...] * 0 - 25
    model.fc.rho_bias[...] = model.fc.rho_bias[...] * 0 - 25
    gd, st = nnx.split(model)

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(st, x, structured):
        return mc_forward(nnx.merge(gd, st), x, 4, return_kl=False,
                          structured=structured)

    x = jax.random.normal(jax.random.key(5), (8, 16, 16, 3))
    a = np.asarray(run(st, x, True))
    b = np.asarray(run(st, x, False))
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)
