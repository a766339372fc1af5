"""Training resume: checkpoint carries optimizer + epoch + best_acc +
RNG counters, and a killed-and-resumed run reproduces the uninterrupted
loss trajectory (reference --resume contract,
main_bayesian_imagenet.py:316-336, main_bayesian_cifar.py:204-215)."""

import numpy as np
import optax
from flax import nnx

from bayesian_torch_tpu.examples import _engine as engine
from bayesian_torch_tpu.layers import (
    Conv2dReparameterization,
    LinearReparameterization,
    make_rngs,
)
from bayesian_torch_tpu.utils.checkpoint import (
    load_training_checkpoint,
    save_training_checkpoint,
)


class TinyBNN(nnx.Module):
    def __init__(self, *, rngs):
        self.conv = Conv2dReparameterization(1, 4, 3, padding=1, rngs=rngs)
        self.fc = LinearReparameterization(4 * 8 * 8, 3, rngs=rngs)

    def __call__(self, x):
        out, kl1 = self.conv(x)
        out = nnx.relu(out).reshape(out.shape[0], -1)
        out, kl2 = self.fc(out)
        return out, kl1 + kl2


def _data(n=48):
    rs = np.random.RandomState(0)
    y = rs.randint(0, 3, size=n)
    x = rs.randn(n, 1, 8, 8).astype(np.float32) + y[:, None, None, None]
    return x, y


def _fresh():
    model = TinyBNN(rngs=make_rngs(0, noise_seed=1))
    model.train()
    opt = nnx.Optimizer(model, optax.adam(1e-2), wrt=nnx.Param)
    return model, opt


def test_resume_matches_uninterrupted(tmp_path):
    data = _data()

    model, opt = _fresh()
    full = engine.train(model, opt, data, epochs=4, batch_size=16,
                        num_mc=2, log_every=1)

    # interrupted run: 2 epochs with checkpointing, then a FRESH
    # process-equivalent (new model/optimizer, same seeds) resumes
    ckdir = str(tmp_path / "ck")
    model, opt = _fresh()
    engine.train(model, opt, data, epochs=2, batch_size=16, num_mc=2,
                 log_every=1, checkpoint_dir=ckdir)
    model, opt = _fresh()
    resumed = engine.train(model, opt, data, epochs=4, batch_size=16,
                           num_mc=2, log_every=1, checkpoint_dir=ckdir,
                           resume=True)

    assert [h["epoch"] for h in resumed] == [2, 3]
    for h_full, h_res in zip(full[2:], resumed):
        np.testing.assert_allclose(h_full["loss"], h_res["loss"],
                                   rtol=1e-5)


def test_checkpoint_roundtrip_fields(tmp_path):
    model, opt = _fresh()
    x, y = _data(16)
    step = engine.make_train_step(num_mc=1, batch_size=16)
    import jax.numpy as jnp
    step(model, opt, jnp.asarray(x[:16]), jnp.asarray(y[:16]))
    path = str(tmp_path / "full_ck")
    save_training_checkpoint(path, model, opt, epoch=7, best_acc=0.81)

    model2, opt2 = _fresh()
    meta = load_training_checkpoint(path, model2, opt2)
    assert meta["epoch"] == 7
    assert abs(meta["best_acc"] - 0.81) < 1e-6
    # optimizer moments restored
    m1 = nnx.to_pure_dict(nnx.state(opt))
    m2 = nnx.to_pure_dict(nnx.state(opt2))
    import jax
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # noise counters restored: the next draw continues the sequence
    c1 = nnx.to_pure_dict(nnx.state(model, nnx.RngCount))
    c2 = nnx.to_pure_dict(nnx.state(model2, nnx.RngCount))
    for a, b in zip(jax.tree.leaves(c1), jax.tree.leaves(c2)):
        assert np.asarray(a) == np.asarray(b)
