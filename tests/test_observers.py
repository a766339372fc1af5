"""Observer / QConfig coverage: torch-oracle parity for
PerChannelMinMaxObserver, behavioral checks for HistogramObserver's
MSE clip search, QConfig plumbing through prepare(), and the
reference-namespace export surface.

Reference: the layer files import HistogramObserver /
PerChannelMinMaxObserver / MinMaxObserver / QConfig into
bayesian_torch.layers (conv_flipout.py:40-41) and build their
calibration stubs from QConfig(weight=..., activation=...)
(linear_variational.py:123-129).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from flax import nnx

from bayesian_torch_tpu.quantization import (
    HistogramObserver,
    MinMaxObserver,
    PerChannelMinMaxObserver,
    QConfig,
    convert,
    prepare,
)


def _quant_mse(x, scale, zp):
    """Round-trip error through quint8 with the given qparams."""
    q = np.clip(np.round(x / scale) + zp, 0, 255)
    return float(np.mean((x - (q - zp) * scale) ** 2))


class TestPerChannelMinMax:
    def test_qint8_parity_vs_torch(self):
        x = np.random.RandomState(0).randn(16, 64).astype(np.float32) * 3
        ours = PerChannelMinMaxObserver(dtype="qint8", ch_axis=0)
        ours(jnp.asarray(x))
        s, zp = ours.calculate_qparams()

        ref = torch.ao.quantization.PerChannelMinMaxObserver(
            ch_axis=0, dtype=torch.qint8,
            qscheme=torch.per_channel_symmetric)
        ref(torch.from_numpy(x))
        rs, rzp = ref.calculate_qparams()
        np.testing.assert_allclose(s, rs.numpy(), rtol=1e-5)
        np.testing.assert_array_equal(zp, rzp.numpy())

    def test_quint8_parity_vs_torch(self):
        x = np.random.RandomState(1).randn(8, 32).astype(np.float32)
        ours = PerChannelMinMaxObserver(dtype="quint8", ch_axis=1)
        ours(jnp.asarray(x))
        s, zp = ours.calculate_qparams()

        ref = torch.ao.quantization.PerChannelMinMaxObserver(
            ch_axis=1, dtype=torch.quint8,
            qscheme=torch.per_channel_affine)
        ref(torch.from_numpy(x))
        rs, rzp = ref.calculate_qparams()
        np.testing.assert_allclose(s, rs.numpy(), rtol=1e-5)
        np.testing.assert_array_equal(zp, rzp.numpy())

    def test_accumulates_across_batches(self):
        a = np.float32([[1.0, -2.0]])
        b = np.float32([[5.0, 0.5]])
        obs = PerChannelMinMaxObserver(dtype="quint8", ch_axis=1)
        obs(jnp.asarray(a))
        obs(jnp.asarray(b))
        np.testing.assert_allclose(obs.min_val[...], [1.0, -2.0])
        np.testing.assert_allclose(obs.max_val[...], [5.0, 0.5])


class TestHistogramObserver:
    """The observer is torch HistogramObserver's L2 search ported 1:1;
    the contract tested here is *torch parity*, not aggressive outlier
    clipping — torch's own observer keeps rare far outliers in range
    (clipping a 0.1% spike at 100σ costs more L2 than the whole
    dataset's rounding noise; verified against the torch oracle)."""

    @staticmethod
    def _torch_qparams(data_chunks, dtype, qscheme=None):
        kw = {} if qscheme is None else {"qscheme": qscheme}
        ref = torch.ao.quantization.HistogramObserver(dtype=dtype, **kw)
        for c in data_chunks:
            ref(torch.from_numpy(c))
        s, zp = ref.calculate_qparams()
        return float(s), float(zp)

    def test_far_outliers_torch_parity(self):
        rng = np.random.RandomState(2)
        data = rng.randn(20000).astype(np.float32)
        data[:20] = 100.0  # 0.1% far outliers
        hob = HistogramObserver(dtype="quint8")
        # two chunks so the running-range remap path is exercised
        for chunk in (data[:5000], data[5000:]):
            hob(jnp.asarray(chunk))
        hs, hzp = hob.calculate_qparams()
        ts, tzp = self._torch_qparams([data[:5000], data[5000:]],
                                      torch.quint8)
        # torch does NOT clip this spike (L2 objective); neither do we
        assert abs(hs - ts) / ts < 0.02
        assert abs(hzp - tzp) <= 2

    def test_clean_data_close_to_minmax(self):
        data = np.random.RandomState(3).uniform(
            0, 5, 10000).astype(np.float32)
        hob = HistogramObserver(dtype="quint8")
        mob = MinMaxObserver(dtype="quint8")
        hob(jnp.asarray(data))
        mob(jnp.asarray(data))
        hs, _ = hob.calculate_qparams()
        ms, _ = mob.calculate_qparams()
        assert abs(hs - ms) / ms < 0.15  # no outliers -> no real clipping
        ts, _ = self._torch_qparams([data], torch.quint8)
        assert abs(hs - ts) / ts < 0.02

    def test_qint8_symmetric_torch_parity(self):
        rng = np.random.RandomState(4)
        data = rng.randn(20000).astype(np.float32)
        data[:10] = -80.0
        hob = HistogramObserver(dtype="qint8")
        hob(jnp.asarray(data))
        hs, hzp = hob.calculate_qparams()
        assert hzp == 0.0
        ts, _ = self._torch_qparams([data], torch.qint8,
                                    torch.per_tensor_symmetric)
        assert abs(hs - ts) / ts < 0.02

    def test_heavy_tails_narrow_below_minmax(self):
        """Where the L2 trade does favor clipping (heavy tails), the
        search must actually narrow — and by the same amount torch
        narrows. This is the test that the search functions at all
        (a MinMax impostor fails the strict inequality)."""
        data = np.random.RandomState(7).laplace(
            0, 1, 20000).astype(np.float32)
        hob = HistogramObserver(dtype="quint8")
        mob = MinMaxObserver(dtype="quint8")
        hob(jnp.asarray(data))
        mob(jnp.asarray(data))
        hs, hzp = hob.calculate_qparams()
        ms, mzp = mob.calculate_qparams()
        assert hs < 0.995 * ms  # strictly narrower than the extrema
        ts, _ = self._torch_qparams([data], torch.quint8)
        assert abs(hs - ts) / ts < 0.02
        # narrowing must not hurt the end metric
        assert _quant_mse(data, hs, hzp) <= _quant_mse(data, ms, mzp) * 1.01

    def test_mass_conserved_across_range_growth(self):
        rng = np.random.RandomState(5)
        obs = HistogramObserver(dtype="quint8", bins=512)
        a = rng.uniform(0, 1, 4096).astype(np.float32)
        b = rng.uniform(-10, 10, 4096).astype(np.float32)  # 20x range
        obs(jnp.asarray(a))
        obs(jnp.asarray(b))
        total = float(jnp.sum(obs.histogram[...]))
        assert abs(total - 8192) / 8192 < 1e-3

    def test_constant_then_varying_data(self):
        obs = HistogramObserver(dtype="quint8", bins=128)
        obs(jnp.full((100,), 2.0))
        obs(jnp.linspace(0.0, 4.0, 100))
        total = float(jnp.sum(obs.histogram[...]))
        assert abs(total - 200) / 200 < 1e-3
        s, zp = obs.calculate_qparams()
        assert s > 0

    def test_works_under_jit(self):
        import jax

        obs = HistogramObserver(dtype="quint8", bins=256)
        gdef, state = nnx.split(obs)

        @jax.jit
        def record(state, x):
            ob = nnx.merge(gdef, state)
            ob(x)
            return nnx.state(ob)

        state = record(state, jnp.linspace(0.0, 1.0, 1000))
        state = record(state, jnp.linspace(-3.0, 5.0, 1000))
        obs2 = nnx.merge(gdef, state)
        assert abs(float(jnp.sum(obs2.histogram[...])) - 2000) < 2
        s, _ = obs2.calculate_qparams()
        assert 0 < s < 1


class _Net(nnx.Module):
    def __init__(self):
        from bayesian_torch_tpu.layers import LinearReparameterization
        self.fc = LinearReparameterization(
            8, 4, rngs=nnx.Rngs(params=0, noise=1))

    def __call__(self, x):
        return self.fc(x)


class TestQConfig:
    def test_with_args_factory(self):
        fac = HistogramObserver.with_args(dtype="qint8", bins=64)
        ob = fac()
        assert isinstance(ob, HistogramObserver)
        assert ob.dtype == "qint8" and ob.bins == 64

    def test_prepare_uses_qconfig_observers(self):
        net = _Net()
        qc = QConfig(activation=HistogramObserver.with_args(dtype="quint8"),
                     weight=MinMaxObserver.with_args(dtype="qint8"))
        prepare(net, qc)
        assert all(isinstance(o, MinMaxObserver) for o in net.fc.qint_quant)
        assert all(isinstance(o, HistogramObserver)
                   for o in net.fc.quint_quant)

    def test_histogram_qconfig_end_to_end(self):
        net = _Net()
        x = jnp.asarray(np.random.RandomState(6).randn(16, 8)
                        .astype(np.float32))
        f_out, _ = net(x)
        qc = QConfig(activation=HistogramObserver.with_args(dtype="quint8"),
                     weight=MinMaxObserver.with_args(dtype="qint8"))
        prepare(net, qc)
        net(x)
        convert(net)
        assert type(net.fc).__name__ == "QuantizedLinearReparameterization"
        q_out, _ = net(x)
        assert q_out.shape == f_out.shape

    def test_swapped_dtype_qconfig_raises(self):
        """A weight factory yielding quint8 (or activation yielding
        qint8) would put affine qparams into slots the quantized
        kernels consume positionally as symmetric — prepare() must
        fail loudly instead of silently mis-quantizing."""
        net = _Net()
        qc = QConfig(activation=MinMaxObserver.with_args(dtype="qint8"),
                     weight=MinMaxObserver.with_args(dtype="quint8"))
        with pytest.raises(ValueError, match="dtype"):
            prepare(net, qc)

    def test_per_channel_harvest_raises(self):
        net = _Net()
        qc = QConfig(
            activation=MinMaxObserver.with_args(dtype="quint8"),
            weight=PerChannelMinMaxObserver.with_args(dtype="qint8"))
        prepare(net, qc)
        net(jnp.ones((4, 8)))
        with pytest.raises(ValueError, match="per-tensor"):
            convert(net)


class TestReferenceNamespaceParity:
    REF_LAYER_EXPORTS = [
        "BaseVariationalLayer_", "BatchNorm1dLayer", "BatchNorm2dLayer",
        "BatchNorm3dLayer", "Conv1dFlipout", "Conv1dReparameterization",
        "Conv2dFlipout", "Conv2dReparameterization", "Conv3dFlipout",
        "Conv3dReparameterization", "ConvTranspose1dFlipout",
        "ConvTranspose1dReparameterization", "ConvTranspose2dFlipout",
        "ConvTranspose2dReparameterization", "ConvTranspose3dFlipout",
        "ConvTranspose3dReparameterization", "Dropout", "HistogramObserver",
        "LSTMFlipout", "LSTMReparameterization", "LinearFlipout",
        "LinearReparameterization", "MinMaxObserver",
        "PerChannelMinMaxObserver", "QConfig", "QuantizedConv1dFlipout",
        "QuantizedConv1dReparameterization", "QuantizedConv2dFlipout",
        "QuantizedConv2dReparameterization", "QuantizedConv3dFlipout",
        "QuantizedConv3dReparameterization",
        "QuantizedConvTranspose1dFlipout",
        "QuantizedConvTranspose1dReparameterization",
        "QuantizedConvTranspose2dFlipout",
        "QuantizedConvTranspose2dReparameterization",
        "QuantizedConvTranspose3dFlipout",
        "QuantizedConvTranspose3dReparameterization",
        "QuantizedLinearFlipout", "QuantizedLinearReparameterization",
        "ReLU", "get_kernel_size",
    ]

    def test_every_reference_layers_export_importable(self):
        """Every public name a reference user can import from
        bayesian_torch.layers resolves here too (torch-internal leakage
        like `nn`/`Parameter` excluded)."""
        import bayesian_torch_tpu.layers as L

        missing = [n for n in self.REF_LAYER_EXPORTS if not hasattr(L, n)]
        assert not missing, f"missing layers exports: {missing}"
