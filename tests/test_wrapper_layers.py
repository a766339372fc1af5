"""BatchNorm/Dropout/ReLU wrapper layers: tuple convention + torch parity."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bayesian_torch_tpu.layers import (BatchNorm1dLayer, BatchNorm2dLayer,
                                       BatchNorm3dLayer, Dropout, ReLU)

torch = pytest.importorskip("torch")


def test_relu_tuple_and_bare():
    r = ReLU()
    x = jnp.array([[-1.0, 2.0]])
    out, kl = r((x, 5.0))
    assert kl == 0
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 2.0]])
    bare = r(x)
    np.testing.assert_array_equal(np.asarray(bare), [[0.0, 2.0]])


def test_dropout_train_eval():
    d = Dropout(p=0.5, rngs=nnx.Rngs(noise=0))
    x = jnp.ones((100, 100))
    out, kl = d((x, 0.0))
    assert kl == 0
    frac_zero = float((np.asarray(out) == 0).mean())
    assert 0.4 < frac_zero < 0.6
    # kept units are scaled by 1/keep
    assert float(np.asarray(out).max()) == pytest.approx(2.0)
    d.eval()
    out2, _ = d((x, 0.0))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x))


def test_dropout_invalid_p():
    with pytest.raises(ValueError):
        Dropout(p=1.5)


@pytest.mark.parametrize("cls,nd", [(BatchNorm1dLayer, 1),
                                    (BatchNorm2dLayer, 2),
                                    (BatchNorm3dLayer, 3)])
def test_batchnorm_matches_torch(cls, nd):
    tcls = {1: torch.nn.BatchNorm1d, 2: torch.nn.BatchNorm2d,
            3: torch.nn.BatchNorm3d}[nd]
    ours = cls(5)
    ref = tcls(5)
    # align affine params (ours inits weight=1 w/o rngs; torch inits 1)
    x = np.random.RandomState(0).randn(4, 5, *(6,) * nd).astype(np.float32)

    # training step parity (running stats update + batch-stat normalize)
    for i in range(3):
        xi = x + i
        out = ours((jnp.asarray(xi), 0.0))[0]
        ref_out = ref(torch.from_numpy(xi))
        np.testing.assert_allclose(np.asarray(out),
                                   ref_out.detach().numpy(), rtol=1e-4,
                                   atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.running_mean[...]),
                               ref.running_mean.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.running_var[...]),
                               ref.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval parity (running-stat normalize)
    ours.eval()
    ref.eval()
    out = ours((jnp.asarray(x), 0.0))[0]
    ref_out = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.detach().numpy(),
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_wrong_ndim_raises():
    bn = BatchNorm2dLayer(3)
    with pytest.raises(ValueError, match="expected 4D"):
        bn(jnp.ones((2, 3, 4)))
