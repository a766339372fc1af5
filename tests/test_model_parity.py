"""Model-level golden parity: our SCNN vs the reference SCNN with
identical parameters (sigma ~ 0 so both are deterministic)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from tests import reference_oracle as oracle


@pytest.mark.skipif(not oracle.reference_available(), reason="no ref")
def test_scnn_forward_and_kl_parity():
    import torch

    oracle.import_reference()
    import bayesian_torch_tpu.models._scnn as scnn_mod
    from bayesian_torch.models.bayesian.simple_cnn_variational import (
        SCNN as RefSCNN)

    old = scnn_mod.posterior_rho_init
    try:
        scnn_mod.posterior_rho_init = -100.0
        from bayesian_torch_tpu.models.bayesian.simple_cnn_variational \
            import SCNN
        ours = SCNN(rngs=nnx.Rngs(params=0, noise=1))
        ours.eval()
    finally:
        scnn_mod.posterior_rho_init = old

    ref = RefSCNN()
    ref.eval()
    with torch.no_grad():
        for our_layer, ref_layer, kind in [
            (ours.conv1, ref.conv1, "conv"),
            (ours.conv2, ref.conv2, "conv"),
            (ours.fc1, ref.fc1, "lin"),
            (ours.fc2, ref.fc2, "lin"),
        ]:
            if kind == "conv":
                ref_layer.mu_kernel.data.copy_(
                    oracle.to_torch(our_layer.mu_kernel[...]))
                ref_layer.rho_kernel.data.copy_(
                    oracle.to_torch(our_layer.rho_kernel[...]))
            else:
                ref_layer.mu_weight.data.copy_(
                    oracle.to_torch(our_layer.mu_weight[...]))
                ref_layer.rho_weight.data.copy_(
                    oracle.to_torch(our_layer.rho_weight[...]))
            ref_layer.mu_bias.data.copy_(
                oracle.to_torch(our_layer.mu_bias[...]))
            ref_layer.rho_bias.data.copy_(
                oracle.to_torch(our_layer.rho_bias[...]))

    x = np.random.RandomState(0).randn(4, 1, 28, 28).astype(np.float32)
    out_ours, kl_ours = ours(jnp.asarray(x))
    with torch.no_grad():
        out_ref, kl_ref = ref(oracle.to_torch(x))

    # log-softmax outputs equal (sigma ~ 0 makes both deterministic)
    np.testing.assert_allclose(np.asarray(out_ours),
                               out_ref.detach().numpy(), rtol=1e-4,
                               atol=1e-4)
    # predictive NLL parity on the same labels
    y = np.random.RandomState(1).randint(0, 10, 4)
    nll_ours = -np.asarray(out_ours)[np.arange(4), y].mean()
    nll_ref = -out_ref.detach().numpy()[np.arange(4), y].mean()
    assert nll_ours == pytest.approx(nll_ref, rel=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from bayesian_torch_tpu.layers import LinearReparameterization
    from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    m1 = LinearReparameterization(8, 4, rngs=nnx.Rngs(params=0, noise=1))
    save_checkpoint(m1, str(tmp_path / "ckpt"))

    m2 = LinearReparameterization(8, 4, rngs=nnx.Rngs(params=9, noise=10))
    assert np.any(np.asarray(m1.mu_weight[...])
                  != np.asarray(m2.mu_weight[...]))
    load_checkpoint(m2, str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(m1.mu_weight[...]),
                                  np.asarray(m2.mu_weight[...]))
    np.testing.assert_array_equal(np.asarray(m1.rho_bias[...]),
                                  np.asarray(m2.rho_bias[...]))
    # identical KL after restore
    assert float(m1.kl_loss()) == pytest.approx(float(m2.kl_loss()),
                                                rel=1e-6)

    # re-saving to the same path overwrites (torch.save semantics) —
    # re-running a trainer must not crash on its own previous output
    save_checkpoint(m2, str(tmp_path / "ckpt"))
    load_checkpoint(m1, str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(m1.mu_weight[...]),
                                  np.asarray(m2.mu_weight[...]))


@pytest.mark.slow
def test_lstm_timeseries_example(tmp_path):
    from bayesian_torch_tpu.examples.main_bayesian_lstm_timeseries import (
        main,
    )
    rmse = main(["--steps=80", "--seq-len=24", "--batch-size=16",
                 "--hidden=16", "--num_monte_carlo=4",
                 f"--save_dir={tmp_path}"])
    assert rmse < 1.0  # learned something on the synthetic signal
