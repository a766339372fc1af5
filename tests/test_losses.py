"""UQ losses: parity against the reference torch implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_torch_tpu.utils.avuc_loss import (AUAvULoss, AvULoss,
                                                accuracy_vs_uncertainty,
                                                eval_avu)
from bayesian_torch_tpu.utils.uncertainty_calibration_loss import (
    AvULoss as VecAvULoss,
    EaCLoss,
    EaULoss,
)
from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")


def _logits_labels(n=64, c=10, seed=0):
    rs = np.random.RandomState(seed)
    logits = rs.randn(n, c).astype(np.float32) * 2
    labels = rs.randint(0, c, size=n).astype(np.int64)
    return logits, labels


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_avu_loss_matches_reference():
    oracle.import_reference()
    from bayesian_torch.utils.avuc_loss import AvULoss as RefAvULoss

    logits, labels = _logits_labels()
    ref = float(RefAvULoss(beta=3)(torch.from_numpy(logits),
                                   torch.from_numpy(labels), 0.5))
    ours = float(AvULoss(beta=3)(jnp.asarray(logits), jnp.asarray(labels),
                                 0.5))
    assert ours == pytest.approx(ref, rel=1e-4)


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_auavu_loss_matches_reference_math():
    """The reference AUAvULoss.forward itself crashes (torch.log on the
    float sklearn.auc returns, avuc_loss.py:364-365) — reconstruct its
    intended value from the reference AvULoss soft counts per threshold
    + sklearn auc, and compare our AUAvULoss to that."""
    oracle.import_reference()
    from sklearn.metrics import auc as sk_auc
    from bayesian_torch.utils.avuc_loss import AvULoss as RefAvULoss

    logits, labels = _logits_labels(seed=1)
    tl, ll = torch.from_numpy(logits), torch.from_numpy(labels)

    # uncertainties as the reference computes them
    probs = torch.nn.functional.softmax(tl, dim=1)
    unc = -torch.sum(probs * torch.log(probs + 1e-10), dim=-1)
    umin, umax = float(unc.min()), float(unc.max())
    th_list = np.linspace(0, 1, 21)
    ref_loss_fn = RefAvULoss()
    avus = [float(torch.exp(-ref_loss_fn(tl, ll, umin + t * (umax - umin))))
            for t in th_list]
    ref_auc = sk_auc(th_list, np.asarray(avus))
    ref_loss = -np.log(ref_auc + 1e-10)

    loss, auc_val = AUAvULoss()(jnp.asarray(logits), jnp.asarray(labels))
    assert float(auc_val) == pytest.approx(float(ref_auc), rel=1e-4)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-4)


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_eau_loss_matches_reference():
    oracle.import_reference()
    from bayesian_torch.utils.uncertainty_calibration_loss import (
        EaULoss as RefEaULoss)

    rs = np.random.RandomState(2)
    error = np.abs(rs.randn(50)).astype(np.float32)
    unc = np.abs(rs.randn(50)).astype(np.float32)
    ref = float(RefEaULoss(beta=2)(torch.from_numpy(error),
                                   torch.from_numpy(unc), 0.7, 0.6))
    ours = float(EaULoss(beta=2)(jnp.asarray(error), jnp.asarray(unc),
                                 0.7, 0.6))
    assert ours == pytest.approx(ref, rel=1e-4)


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_eac_loss_matches_reference():
    oracle.import_reference()
    from bayesian_torch.utils.uncertainty_calibration_loss import (
        EaCLoss as RefEaCLoss)

    rs = np.random.RandomState(3)
    error = np.abs(rs.randn(50)).astype(np.float32)
    conf = rs.uniform(0, 1, 50).astype(np.float32)
    ref = float(RefEaCLoss()(torch.from_numpy(error),
                             torch.from_numpy(conf), 0.7, 0.5))
    ours = float(EaCLoss()(jnp.asarray(error), jnp.asarray(conf), 0.7, 0.5))
    assert ours == pytest.approx(ref, rel=1e-4)


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_vectorized_avu_matches_reference():
    oracle.import_reference()
    from bayesian_torch.utils.uncertainty_calibration_loss import (
        AvULoss as RefVecAvULoss)

    logits, labels = _logits_labels(seed=4)
    ref = float(RefVecAvULoss(beta=1)(torch.from_numpy(logits),
                                      torch.from_numpy(labels), 0.5))
    ours = float(VecAvULoss(beta=1)(jnp.asarray(logits),
                                    jnp.asarray(labels), 0.5))
    assert ours == pytest.approx(ref, rel=1e-4)


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_eval_avu_matches_reference():
    oracle.import_reference()
    from bayesian_torch.utils.avuc_loss import eval_avu as ref_eval_avu

    rs = np.random.RandomState(5)
    pred = rs.randint(0, 10, 100)
    true = rs.randint(0, 10, 100)
    unc = rs.uniform(0, 2, 100)
    ref_avu, ref_th = ref_eval_avu(pred, true, unc)
    avu, th = eval_avu(pred, true, unc)
    np.testing.assert_allclose(avu, ref_avu, rtol=1e-6)
    np.testing.assert_allclose(th, ref_th, rtol=1e-6)


def test_avu_loss_is_differentiable():
    import jax
    logits, labels = _logits_labels(seed=6)

    def loss_fn(lg):
        return AvULoss()(lg, jnp.asarray(labels), 0.5)

    g = jax.grad(loss_fn)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert np.any(np.asarray(g) != 0)


def test_auavu_jits():
    import jax
    logits, labels = _logits_labels(seed=7)
    loss, auc = jax.jit(lambda lg, lb: AUAvULoss()(lg, lb))(
        jnp.asarray(logits), jnp.asarray(labels))
    assert np.isfinite(float(loss))
