"""INT8 quantization: ops parity vs torch quantized kernels, scale-rule
parity, prepare/calibrate/convert round trip, BN folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import bayesian_torch_tpu.layers as L
from bayesian_torch_tpu.ops import int8 as q
from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")


class TestInt8Ops:
    def test_symmetric_scale_rule_matches_reference(self):
        x = jnp.asarray(np.random.RandomState(0).randn(10, 10) * 3)
        # reference: scale = 2*clamp(max|x|,0,100)/255
        expected = float(np.clip(np.abs(np.asarray(x)).max(), 0, 100)) \
            * 2 / 255
        assert float(q.symmetric_scale(x)) == pytest.approx(expected,
                                                            rel=1e-6)
        assert float(q.symmetric_scale(jnp.zeros((3,)))) == pytest.approx(
            0.1)  # default fallback

    def test_quantize_dequantize_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(1).randn(64).astype(
            np.float32))
        scale = q.symmetric_scale(x)
        xq = q.quantize_int8(x, scale)
        np.testing.assert_allclose(np.asarray(q.dequantize(xq, scale)),
                                   np.asarray(x), atol=float(scale))

    def test_qlinear_matches_torch_quantized(self):
        rs = np.random.RandomState(2)
        x = rs.randn(4, 8).astype(np.float32)
        w = rs.randn(5, 8).astype(np.float32) * 0.5
        b = rs.randn(5).astype(np.float32)

        x_scale, x_zp = 0.05, 128
        w_scale = float(q.symmetric_scale(jnp.asarray(w)))
        out_scale, out_zp = 0.1, 128

        xq = q.quantize_uint8(jnp.asarray(x), x_scale, x_zp)
        wq = q.quantize_int8(jnp.asarray(w), w_scale)
        ours_q = q.qlinear(xq, x_scale, x_zp, wq, w_scale, jnp.asarray(b),
                           out_scale, out_zp)
        ours = np.asarray(q.dequantize(ours_q, out_scale, out_zp))

        tx = torch.quantize_per_tensor(torch.from_numpy(x), x_scale, x_zp,
                                       torch.quint8)
        tw = torch.quantize_per_tensor(torch.from_numpy(w), w_scale, 0,
                                       torch.qint8)
        ref = torch.nn.quantized.functional.linear(
            tx, tw, torch.from_numpy(b), scale=out_scale,
            zero_point=out_zp).dequantize().numpy()
        # identical math up to rounding-mode differences: 1 quantum
        np.testing.assert_allclose(ours, ref, atol=out_scale + 1e-6)

    def test_qmul_qadd_match_torch(self):
        rs = np.random.RandomState(3)
        a = rs.randn(32).astype(np.float32)
        b = rs.randn(32).astype(np.float32)
        a_s, b_s, o_s = 0.02, 0.03, 0.01
        aq = q.quantize_int8(jnp.asarray(a), a_s)
        bq = q.quantize_int8(jnp.asarray(b), b_s)

        ta = torch.quantize_per_tensor(torch.from_numpy(a), a_s, 0,
                                       torch.qint8)
        tb = torch.quantize_per_tensor(torch.from_numpy(b), b_s, 0,
                                       torch.qint8)
        ref_mul = torch.ops.quantized.mul(ta, tb, o_s, 0).dequantize()
        ours_mul = q.dequantize(q.qmul(aq, a_s, bq, b_s, o_s, 0), o_s)
        np.testing.assert_allclose(np.asarray(ours_mul), ref_mul.numpy(),
                                   atol=o_s + 1e-6)

        ref_add = torch.ops.quantized.add(ta, tb, o_s, 0).dequantize()
        ours_add = q.dequantize(q.qadd(aq, a_s, bq, b_s, o_s, 0), o_s)
        np.testing.assert_allclose(np.asarray(ours_add), ref_add.numpy(),
                                   atol=o_s + 1e-6)


class TestQuantizedLayers:
    def _float_linear(self, rho=-6.0):
        return L.LinearReparameterization(
            16, 8, posterior_rho_init=rho, rngs=nnx.Rngs(params=0, noise=1))

    def test_convert_roundtrip_close_to_float_mean(self):
        from bayesian_torch_tpu.quantization import convert, prepare

        class Net(nnx.Module):
            def __init__(self, fc):
                self.fc = fc

            def __call__(self, x):
                return self.fc(x)

        net = Net(self._float_linear(rho=-10.0))  # tiny sigma
        x = jnp.asarray(np.random.RandomState(0).randn(32, 16)
                        .astype(np.float32))
        mu_fwd = np.asarray(x) @ np.asarray(net.fc.mu_weight[...]).T \
            + np.asarray(net.fc.mu_bias[...])

        prepare(net)
        for i in range(3):  # calibration
            net(x + 0.1 * i)
        convert(net)

        assert type(net.fc).__name__ == "QuantizedLinearReparameterization"
        assert net.fc.quantized_mu_weight[...].dtype == jnp.int8
        out, kl = net.fc(x)
        assert kl == 0
        # int8 mean path within a few quanta of the float mu forward
        err = np.abs(np.asarray(out) - mu_fwd)
        scale = float(net.fc.quant_dict[4]["scale"])
        assert err.mean() < 3 * scale

    def test_uncalibrated_default_path_runs(self):
        fc = self._float_linear()
        qfc = L.QuantizedLinearReparameterization(16, 8)
        from bayesian_torch_tpu.models.bnn_to_qbnn import _copy_layer_state
        _copy_layer_state(qfc, fc)
        qfc.quantize()
        out, kl = qfc(jnp.ones((2, 16)))
        assert out.shape == (2, 8)

    def test_flipout_quantized_runs(self):
        from bayesian_torch_tpu.models.bnn_to_qbnn import qbnn_linear_layer

        fc = L.LinearFlipout(16, 8, rngs=nnx.Rngs(params=0, noise=1))
        fc.prepare()
        x = jnp.asarray(np.random.RandomState(1).randn(4, 16)
                        .astype(np.float32))
        fc(x)
        qfc = qbnn_linear_layer(fc)
        out, kl = qfc(x)
        assert out.shape == (4, 8)
        assert kl == 0

    def test_quantized_conv_runs(self):
        from bayesian_torch_tpu.models.bnn_to_qbnn import qbnn_conv_layer

        conv = L.Conv2dReparameterization(
            3, 8, 3, padding=1, posterior_rho_init=-8.0,
            rngs=nnx.Rngs(params=0, noise=1))
        conv.prepare()
        x = jnp.asarray(np.random.RandomState(2).randn(2, 3, 8, 8)
                        .astype(np.float32))
        conv(x)
        qconv = qbnn_conv_layer(conv)
        out, kl = qconv(x)
        assert out.shape == (2, 8, 8, 8)


class TestBNFolding:
    def test_fold_matches_float_conv_bn(self):
        from bayesian_torch_tpu.models.bnn_to_qbnn import batch_norm_folding
        import bayesian_torch_tpu.nn as dnn

        conv = L.Conv2dReparameterization(
            3, 4, 3, padding=1, bias=False, posterior_rho_init=-12.0,
            rngs=nnx.Rngs(params=0, noise=1))
        bn = dnn.BatchNorm2d(4)
        # give bn non-trivial stats/affine
        bn.weight[...] = jnp.asarray([1.0, 2.0, 0.5, 1.5])
        bn.bias[...] = jnp.asarray([0.1, -0.2, 0.3, 0.0])
        bn.running_mean[...] = jnp.asarray([0.5, -0.5, 0.0, 1.0])
        bn.running_var[...] = jnp.asarray([1.0, 2.0, 0.5, 1.2])
        bn.eval()
        conv.prepare()
        x = jnp.asarray(np.random.RandomState(3).randn(2, 3, 6, 6)
                        .astype(np.float32))
        conv(x)  # calibrate

        # float reference: conv(mu-only) then eval BN
        float_out = bn(conv(x, eps_k=jnp.zeros(conv.mu_kernel.shape))[0])

        mu_before = np.asarray(conv.mu_kernel[...])
        qconv = batch_norm_folding(conv, bn)

        # 1) folding math: dequantized mu == mu * gamma/sqrt(var+eps)
        #    within one int8 quantum
        coef = np.asarray(bn.weight[...]) / np.sqrt(
            np.asarray(bn.running_var[...]) + bn.eps)
        expected_mu = mu_before * coef.reshape(-1, 1, 1, 1)
        deq_mu = (np.asarray(qconv.quantized_mu_weight[...], np.float32)
                  * float(qconv.mu_weight_scale[...]))
        np.testing.assert_allclose(deq_mu, expected_mu,
                                   atol=float(qconv.mu_weight_scale[...]))

        # 2) fp32 folded bias is exact: (0 - mean)*coef + beta (no conv bias)
        expected_bias = (-np.asarray(bn.running_mean[...])) * coef \
            + np.asarray(bn.bias[...])
        np.testing.assert_allclose(
            np.asarray(qconv.quantized_mu_bias[...]), expected_bias,
            rtol=1e-5)
        assert qconv.quantized_sigma_bias is None  # bias-from-fusion marker

        # 3) end-to-end: int8 folded forward tracks float conv+BN within
        #    accumulated quantization error (weights + activations)
        out, _ = qconv(x)
        err = np.abs(np.asarray(out) - np.asarray(float_out))
        assert err.mean() < 0.3


class TestFullModelPTQ:
    def test_scnn_int8_fidelity(self):
        """End-to-end PTQ fidelity: with near-zero sigma the int8 model
        must track the float model closely (regression test for the
        uint8 zero-point re-centering in qlinear/qconv)."""
        import bayesian_torch_tpu.models._scnn as scnn_mod
        from bayesian_torch_tpu.quantization import convert, prepare

        old = scnn_mod.posterior_rho_init
        try:
            scnn_mod.posterior_rho_init = -10.0
            from bayesian_torch_tpu.models.bayesian.simple_cnn_variational \
                import SCNN
            m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
            m.eval()
            x = jnp.asarray(np.random.RandomState(0)
                            .randn(8, 1, 28, 28).astype(np.float32))
            f_out, _ = m(x)
            prepare(m)
            m(x)
            convert(m)
            q_out, _ = m(x)
            corr = float(jnp.corrcoef(f_out.ravel(), q_out.ravel())[0, 1])
            assert corr > 0.99
            assert float((f_out.argmax(1) == q_out.argmax(1)).mean()) == 1.0
        finally:
            scnn_mod.posterior_rho_init = old

    def test_scnn_prepare_calibrate_convert(self):
        from bayesian_torch_tpu.models.bayesian.simple_cnn_variational \
            import SCNN
        from bayesian_torch_tpu.quantization import convert, prepare

        m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
        m.eval()
        x = jnp.asarray(np.random.RandomState(4).randn(2, 1, 28, 28)
                        .astype(np.float32))
        prepare(m)
        m(x)
        convert(m)
        assert type(m.conv1).__name__ == "QuantizedConv2dReparameterization"
        assert type(m.fc2).__name__ == "QuantizedLinearReparameterization"
        out, kl = m(x)
        assert out.shape == (2, 10)
        assert np.isfinite(np.asarray(out)).all()


class TestQTensorFlow:
    """uint8 activations flowing BETWEEN quantized layers (QTensor,
    ops/qtensor.py) — the torch-equivalent of quantized tensors flowing
    through QuantStub/FloatFunctional graphs. With matching scales the
    quantized-domain relu/add/maxpool are exact vs the fp32 round-trip
    flow; residual adds additionally clip to the representable range
    (as torch's quantized add does)."""

    def test_primitives_exact(self):
        from bayesian_torch_tpu.nn import functional as F
        from bayesian_torch_tpu.ops.qtensor import QTensor

        rs = np.random.RandomState(0)
        x = rs.randn(2, 4, 8, 8).astype(np.float32) * 5
        s, z = 0.2, 128
        xq = QTensor(q.quantize_uint8(jnp.asarray(x), s, z), s, z)

        # relu: max in q-domain == quantize(relu(dequantize))
        ref = q.quantize_uint8(jax.nn.relu(xq.dequantize()), s, z)
        np.testing.assert_array_equal(np.asarray(xq.relu().q),
                                      np.asarray(ref))

        # add (same scale): integer add == quantize(deq+deq), clipped
        y = rs.randn(2, 4, 8, 8).astype(np.float32) * 5
        yq = QTensor(q.quantize_uint8(jnp.asarray(y), s, z), s, z)
        ref = q.quantize_uint8(xq.dequantize() + yq.dequantize(), s, z)
        np.testing.assert_array_equal(np.asarray((xq + yq).q),
                                      np.asarray(ref))

        # add (different scales) falls back to fp32
        zq = QTensor(q.quantize_uint8(jnp.asarray(y), 0.1, z), 0.1, z)
        out = xq + zq
        assert not isinstance(out, QTensor)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(xq.dequantize() + zq.dequantize()), rtol=1e-6)

        # maxpool: uint8 pooling == quantize(pool(dequantize))
        pooled = F.max_pool_nd(xq, 2)
        ref = q.quantize_uint8(
            F.max_pool_nd(xq.dequantize(), 2), s, z)
        np.testing.assert_array_equal(np.asarray(pooled.q),
                                      np.asarray(ref))

        # requantize: direct uint8->uint8 == quantize(dequantize)
        r = xq.requantize(0.1, 120)
        ref = jnp.round(xq.dequantize() * (1 / 0.1)) + 120
        np.testing.assert_array_equal(
            np.asarray(r.q),
            np.asarray(jnp.clip(ref, 0, 255).astype(jnp.uint8)))

    def test_scnn_qtensor_flow_matches_fp32_flow(self):
        """No residual adds in SCNN: uint8 flow must be bit-identical to
        the fp32 round-trip flow."""
        from bayesian_torch_tpu.models.bayesian.simple_cnn_variational \
            import SCNN
        from bayesian_torch_tpu.quantization import convert, prepare

        x = jnp.asarray(np.random.RandomState(4).randn(2, 1, 28, 28)
                        .astype(np.float32))
        outs = []
        for qa in (False, True):
            m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
            m.eval()
            prepare(m)
            convert(m, quantize_activations=qa)
            out, _ = m(x)
            outs.append(np.asarray(out))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

    def test_cifar_qtensor_flow_option_a_shortcut(self):
        """CIFAR ResNets' zero-pad option-A shortcut must handle
        QTensor block inputs (pads q with the zero-point; regression:
        jnp.pad crashed on QTensor). Flows agree within 1 quantum
        (integer adds vs fp32 tie-breaking)."""
        from bayesian_torch_tpu.models.bayesian.resnet_variational \
            import resnet20
        from bayesian_torch_tpu.quantization import convert, prepare

        x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 32, 32)
                        .astype(np.float32))
        outs = []
        for qa in (False, True):
            m = resnet20(rngs=nnx.Rngs(params=jax.random.key(0),
                                       noise=jax.random.key(1)))
            m.eval()
            for _, mod in nnx.iter_modules(m):
                if getattr(mod, "mu_kernel", None) is not None:
                    mod.mu_kernel[...] = mod.mu_kernel[...] * 0.5
            prepare(m)
            convert(m, fuse_conv_bn=True, quantize_activations=qa)
            out, _ = m(x)
            outs.append(np.asarray(out))
        np.testing.assert_allclose(outs[0], outs[1], atol=0.2 + 1e-6)

    def test_qtensor_flow_composes_with_mc_forward(self):
        """QTensor intermediates (registered pytree) ride the vmapped
        MC axis; draws stay independent per lane."""
        from bayesian_torch_tpu.models.bayesian.simple_cnn_variational \
            import SCNN
        from bayesian_torch_tpu.parallel import mc_forward
        from bayesian_torch_tpu.quantization import convert, prepare

        m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
        m.eval()
        prepare(m)
        convert(m, quantize_activations=True)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 1, 28, 28)
                        .astype(np.float32))
        outs = mc_forward(m, x, 3, return_kl=False)
        assert outs.shape == (3, 4, 10)
        assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))

    def test_qresnet_qtensor_flow(self):
        """ResNet (residual adds): with activations inside the
        representable range the flows agree exactly; q_output set on
        convs only (model head returns a plain array).

        Random-init ResNets grow activations geometrically (BN folding
        of default-init BN is the identity), saturating the
        uncalibrated +-25.4 range — where the uint8 residual add clips
        (like torch's quantized add) but the fp32 flow doesn't. Shrink
        the posteriors so everything stays in range; then the flows
        must agree bit-exactly."""
        from bayesian_torch_tpu.models._large_resnet import make_factories
        from bayesian_torch_tpu.quantization import convert, prepare

        factory = make_factories("Reparameterization")["resnet18"]
        x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 32, 32)
                        .astype(np.float32))
        outs = []
        for qa in (False, True):
            m = factory(rngs=nnx.Rngs(params=jax.random.key(0),
                                      noise=jax.random.key(1)))
            m.eval()
            for _, mod in nnx.iter_modules(m):
                if getattr(mod, "mu_kernel", None) is not None:
                    mod.mu_kernel[...] = mod.mu_kernel[...] * 0.5
            prepare(m)
            convert(m, fuse_conv_bn=True, quantize_activations=qa)
            out, _ = m(x)
            assert isinstance(out, jax.Array)  # head emits fp32
            outs.append(np.asarray(out))
        assert np.abs(outs[0]).max() > 1.0  # non-degenerate signal
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


class TestIm2colQConv:
    """Spatial channels-last qconv routes through uint8 im2col + the
    fused Pallas GEMM+requant kernel (interpret mode on CPU). Must be
    bit-exact vs the XLA conv formulation, including zero-point != 128
    borders (padding with the zp value makes sum w*(x_q - zp) vanish on
    padded taps automatically)."""

    @pytest.mark.parametrize(
        "k,stride,pad,dil,cin,cout,zp",
        [(3, 1, 1, 1, 16, 32, 128),
         (3, 2, 1, 1, 16, 32, 128),
         (7, 2, 3, 1, 3, 16, 128),
         (3, 1, 2, 2, 8, 8, 120),
         (5, 1, 0, 1, 8, 8, 100)])
    def test_matches_xla_qconv(self, k, stride, pad, dil, cin, cout, zp):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randint(0, 256, (2, 14, 14, cin)), jnp.uint8)
        w = jnp.asarray(rs.randint(-128, 128, (cout, cin, k, k)), jnp.int8)
        b = jnp.asarray(rs.randn(cout).astype(np.float32))
        args = dict(stride=stride, padding=pad, dilation=dil,
                    data_format="NHWC")
        old = (q.USE_PALLAS_QMATMUL, q.USE_INT8_IM2COL)
        try:
            q.USE_PALLAS_QMATMUL = False
            ref = q.qconv(x, 0.05, zp, w, 0.01, b, 0.1, 128, **args)
            q.USE_PALLAS_QMATMUL = True
            q.USE_INT8_IM2COL = True
            got = q.qconv(x, 0.05, zp, w, 0.01, b, 0.1, 128, **args)
        finally:
            q.USE_PALLAS_QMATMUL, q.USE_INT8_IM2COL = old
        assert got.shape == ref.shape
        d = np.abs(np.asarray(ref, np.int32)
                   - np.asarray(got, np.int32)).max()
        assert d <= 1, d


class TestQuantizedBatchNorm:
    """Public-surface parity additions: get_scale_and_zero_point,
    get_quantized_tensor, qbnn_batchnorm2d_layer / QuantizedBatchNorm2d
    (reference bnn_to_qbnn.py:45-94,158-171,235)."""

    def test_get_scale_and_zero_point_matches_reference_rule(self):
        from bayesian_torch_tpu.models.bnn_to_qbnn import \
            get_scale_and_zero_point
        x = jnp.asarray(np.random.RandomState(2).randn(7, 5) * 4)
        scale, zp = get_scale_and_zero_point(x)
        assert zp == 0
        assert scale == pytest.approx(
            float(np.clip(np.abs(np.asarray(x)).max(), 0, 100)) * 2 / 255,
            rel=1e-6)
        # static (python float) when input is concrete -> jit-constant
        assert isinstance(scale, float)

    def test_get_quantized_tensor_roundtrip_and_torch_parity(self):
        from bayesian_torch_tpu.models.bnn_to_qbnn import \
            get_quantized_tensor
        x = np.random.RandomState(3).randn(33).astype(np.float32)
        qt = get_quantized_tensor(jnp.asarray(x))
        assert qt.q.dtype == jnp.int8 and qt.zp == 0
        tq = torch.quantize_per_tensor(
            torch.from_numpy(x), qt.scale, 0, torch.qint8)
        np.testing.assert_array_equal(
            np.asarray(qt.q), tq.int_repr().numpy())
        np.testing.assert_allclose(
            np.asarray(qt.dequantize()), x, atol=qt.scale)

    def test_quantized_bn_requantizes_qtensor_input(self):
        from bayesian_torch_tpu.models.bnn_to_qbnn import \
            qbnn_batchnorm2d_layer
        from bayesian_torch_tpu.ops.qtensor import QTensor
        rng = np.random.RandomState(4)
        bn = L.BatchNorm2dLayer(6, rngs=nnx.Rngs(params=0))
        bn.eval()
        bn.running_mean[...] = jnp.asarray(rng.randn(6) * 0.3)
        bn.running_var[...] = jnp.asarray(rng.rand(6) + 0.5)
        qbn = qbnn_batchnorm2d_layer(bn)
        x = rng.rand(2, 6, 5, 5).astype(np.float32) * 2  # in [0, 2]
        in_scale, in_zp = 2.0 / 255, 0
        xq = QTensor(
            jnp.asarray(np.clip(np.round(x / in_scale), 0, 255
                                ).astype(np.uint8)), in_scale, in_zp)
        out = qbn(xq)
        assert isinstance(out, QTensor)
        assert (out.scale, out.zp) == (0.1, 128)
        # numerics: float BN on the dequantized input, within 1 quantum
        ref = bn(xq.dequantize())
        np.testing.assert_allclose(np.asarray(out.dequantize()),
                                   np.asarray(ref), atol=0.1 + 1e-6)
        # float input passes through unquantized, same as the base BN
        fout = qbn(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(fout), np.asarray(
            bn(jnp.asarray(x))), rtol=1e-6)

    def test_bnn_to_qbnn_quantize_batchnorm_flag(self):
        from bayesian_torch_tpu.models.bnn_to_qbnn import bnn_to_qbnn
        from bayesian_torch_tpu.models.bayesian.resnet_variational import \
            resnet20
        m = resnet20(rngs=nnx.Rngs(params=0, noise=1))
        m.eval()
        bnn_to_qbnn(m, quantize_batchnorm=True)
        assert type(m.bn1).__name__ == "QuantizedBatchNorm2d"
        x = jnp.asarray(np.random.RandomState(5).rand(2, 3, 32, 32),
                        jnp.float32)
        out, kl = m(x)
        assert out.shape == (2, 10)
        assert bool(jnp.all(jnp.isfinite(out)))
