"""Bayesian LSTM layers: shapes, return convention, KL semantics, parity."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bayesian_torch_tpu.layers import LSTMFlipout, LSTMReparameterization
from tests import reference_oracle as oracle


@pytest.mark.parametrize("cls", [LSTMReparameterization, LSTMFlipout])
def test_return_convention(cls):
    m = cls(5, 7, rngs=nnx.Rngs(params=0, noise=1))
    X = jnp.ones((3, 11, 5))  # (batch, seq, feature)
    out, (h_seq, c_seq), kl = m(X)
    # reference returns the full sequence as the "state" too
    # (rnn_variational.py:151-153)
    assert out.shape == (3, 11, 7)
    assert h_seq.shape == (3, 11, 7)
    assert c_seq.shape == (3, 11, 7)
    assert kl.shape == ()
    assert float(kl) > 0

    m.dnn_to_bnn_flag = True
    out2, state = m(X)
    assert out2.shape == (3, 11, 7)


@pytest.mark.parametrize("cls", [LSTMReparameterization, LSTMFlipout])
def test_kl_is_seqlen_times_layer_kl(cls):
    m = cls(4, 6, rngs=nnx.Rngs(params=0, noise=1))
    X = jnp.ones((2, 9, 4))
    _, _, kl = m(X)
    expected = 9 * (float(m.ih.kl_loss()) + float(m.hh.kl_loss()))
    assert float(kl) == pytest.approx(expected, rel=1e-5)


def test_hidden_state_passthrough():
    m = LSTMReparameterization(4, 6, rngs=nnx.Rngs(params=0, noise=1))
    X = jnp.ones((2, 5, 4))
    h0 = jnp.ones((2, 6)) * 0.3
    c0 = jnp.ones((2, 6)) * -0.2
    out, _, _ = m(X, hidden_states=(h0, c0))
    assert out.shape == (2, 5, 6)


def test_resample_modes_differ_but_same_shapes():
    m1 = LSTMReparameterization(4, 6, rngs=nnx.Rngs(params=0, noise=1),
                                resample_per_step=False)
    out, (h, c), kl = m1(jnp.ones((2, 5, 4)))
    assert out.shape == (2, 5, 6)
    assert float(kl) > 0


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_sigma_zero_parity_with_reference():
    """With rho=-100 (sigma ~ 0) both implementations are deterministic:
    compare full sequence outputs against the reference LSTM cell."""
    import torch
    oracle.import_reference()
    from bayesian_torch.layers import LSTMReparameterization as RefLSTM

    m = LSTMReparameterization(4, 6, posterior_rho_init=-100.0,
                               rngs=nnx.Rngs(params=0, noise=1))
    ref = RefLSTM(4, 6, posterior_rho_init=-100.0)
    with torch.no_grad():
        oracle.copy_linear_params_to_torch(m.ih, ref.ih)
        oracle.copy_linear_params_to_torch(m.hh, ref.hh)

    X = np.random.RandomState(0).randn(3, 7, 4).astype(np.float32)
    out, (h_seq, c_seq), kl = m(jnp.asarray(X))
    ref_out, (ref_h, ref_c), ref_kl = ref(oracle.to_torch(X))

    np.testing.assert_allclose(np.asarray(out), ref_out.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_seq), ref_c.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    assert float(kl) == pytest.approx(float(ref_kl), rel=1e-4)
