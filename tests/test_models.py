"""Model zoo: shapes, KL flow, parameter-count parity with the reference."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from tests import reference_oracle as oracle


def _param_count(model):
    state = nnx.state(model, nnx.Param)
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state))


import jax  # noqa: E402


class TestSCNN:
    def test_bayesian_forward(self):
        from bayesian_torch_tpu.models.bayesian.simple_cnn_variational import SCNN
        m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
        out, kl = m(jnp.ones((2, 1, 28, 28)))
        assert out.shape == (2, 10)
        # log_softmax rows sum to 1 in prob space
        np.testing.assert_allclose(np.exp(np.asarray(out)).sum(1),
                                   np.ones(2), rtol=1e-5)
        assert float(kl) > 0

    def test_flipout_forward(self):
        from bayesian_torch_tpu.models.flipout.simple_cnn import SCNN
        m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
        out, kl = m(jnp.ones((2, 1, 28, 28)))
        assert out.shape == (2, 10)

    def test_deterministic_forward(self):
        from bayesian_torch_tpu.models.deterministic.simple_cnn import SCNN
        m = SCNN(rngs=nnx.Rngs(params=0, noise=1))
        out = m(jnp.ones((2, 1, 28, 28)))
        assert out.shape == (2, 10)

    @pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
    def test_param_count_parity(self):
        oracle.import_reference()
        from bayesian_torch.models.bayesian.simple_cnn_variational import (
            SCNN as RefSCNN)
        from bayesian_torch_tpu.models.bayesian.simple_cnn_variational import (
            SCNN)
        ref_count = sum(p.numel() for p in RefSCNN().parameters()
                        if p.requires_grad)
        assert _param_count(SCNN(rngs=nnx.Rngs(params=0, noise=1))) == \
            ref_count


class TestCifarResNet:
    def test_bayesian_resnet20(self):
        from bayesian_torch_tpu.models.bayesian.resnet_variational import (
            resnet20)
        m = resnet20(rngs=nnx.Rngs(params=0, noise=1))
        out, kl = m(jnp.ones((2, 3, 32, 32)))
        assert out.shape == (2, 10)
        assert float(kl) > 0

    def test_flipout_resnet20(self):
        from bayesian_torch_tpu.models.bayesian.resnet_flipout import resnet20
        m = resnet20(rngs=nnx.Rngs(params=0, noise=1))
        out, kl = m(jnp.ones((2, 3, 32, 32)))
        assert out.shape == (2, 10)

    def test_det_resnet20(self):
        from bayesian_torch_tpu.models.deterministic.resnet import resnet20
        m = resnet20(rngs=nnx.Rngs(params=0, noise=1))
        out = m(jnp.ones((2, 3, 32, 32)))
        assert out.shape == (2, 10)

    @pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
    def test_param_count_parity(self):
        oracle.import_reference()
        from bayesian_torch.models.bayesian.resnet_variational import (
            resnet20 as ref_resnet20)
        from bayesian_torch_tpu.models.bayesian.resnet_variational import (
            resnet20)
        ref_count = sum(p.numel() for p in ref_resnet20().parameters()
                        if p.requires_grad)
        ours = _param_count(resnet20(rngs=nnx.Rngs(params=0, noise=1)))
        assert ours == ref_count


class TestLargeResNet:
    @pytest.mark.slow
    def test_bayesian_resnet18_tiny_input(self):
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet18
        m = resnet18(num_classes=10, rngs=nnx.Rngs(params=0, noise=1))
        # 64x64 input: adaptive avgpool handles the smaller feature map
        out, kl = m(jnp.ones((2, 3, 64, 64)))
        assert out.shape == (2, 10)
        assert float(kl) > 0

    @pytest.mark.slow
    def test_det_resnet50_shapes(self):
        from bayesian_torch_tpu.models.deterministic.resnet_large import (
            resnet50)
        m = resnet50(num_classes=10, rngs=nnx.Rngs(params=0, noise=1))
        out = m(jnp.ones((1, 3, 64, 64)))
        assert out.shape == (1, 10)

    @pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
    def test_param_count_parity_resnet50(self):
        oracle.import_reference()
        from bayesian_torch.models.bayesian.resnet_variational_large import (
            resnet50 as ref_resnet50)
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
        ref_count = sum(p.numel() for p in ref_resnet50().parameters()
                        if p.requires_grad)
        ours = _param_count(resnet50(rngs=nnx.Rngs(params=0, noise=1)))
        assert ours == ref_count


class TestMOPED:
    def test_moped_pairs_cifar_resnets(self):
        from bayesian_torch_tpu.models.bayesian.resnet_variational import (
            resnet20)
        from bayesian_torch_tpu.models.deterministic.resnet import (
            resnet20 as det_resnet20)
        from bayesian_torch_tpu.utils import MOPED, get_rho

        bayes = resnet20(rngs=nnx.Rngs(params=0, noise=1))
        det = det_resnet20(rngs=nnx.Rngs(params=7, noise=8))
        MOPED(bayes, det, None, delta=0.5)

        np.testing.assert_allclose(np.asarray(bayes.conv1.mu_kernel[...]),
                                   np.asarray(det.conv1.weight[...]))
        np.testing.assert_allclose(
            np.asarray(bayes.conv1.rho_kernel[...]),
            np.asarray(get_rho(det.conv1.weight[...], 0.5)), rtol=1e-6)
        # priors set to det weights too
        np.testing.assert_allclose(
            np.asarray(bayes.conv1.prior_weight_mu[...]),
            np.asarray(det.conv1.weight[...]))
        # final linear also transferred
        np.testing.assert_allclose(np.asarray(bayes.linear.mu_weight[...]),
                                   np.asarray(det.linear.weight[...]))


def test_large_resnet_nhwc_matches_nchw():
    """Channels-last (TPU-native) large ResNet is functionally identical
    to the torch-parity NCHW layout: same params, same outputs."""
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from bayesian_torch_tpu.models.bayesian.resnet_variational_large import (
        resnet18,
    )
    from bayesian_torch_tpu.models.deterministic.resnet_large import (
        resnet18 as det18,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 64, 64),
                    jnp.float32)
    x_t = jnp.transpose(x, (0, 2, 3, 1))

    m1 = resnet18(rngs=nnx.Rngs(params=0, noise=1))
    m2 = resnet18(rngs=nnx.Rngs(params=0, noise=1), data_format="NHWC")
    m1.eval(), m2.eval()
    o1, kl1 = m1(x)
    o2, kl2 = m2(x_t)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-4,
                               atol=2e-4)
    assert float(kl1) == pytest.approx(float(kl2), rel=1e-6)

    d1 = det18(rngs=nnx.Rngs(params=0, noise=1))
    d2 = det18(rngs=nnx.Rngs(params=0, noise=1), data_format="NHWC")
    d1.eval(), d2.eval()
    np.testing.assert_allclose(np.asarray(d1(x)), np.asarray(d2(x_t)),
                               rtol=2e-4, atol=2e-4)
