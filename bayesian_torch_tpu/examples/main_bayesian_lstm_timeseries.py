"""Bayesian LSTM sequence regression with uncertainty (time-series UQ).

Covers BASELINE.json config #4 ("LSTMReparameterization/LSTMFlipout
sequence regression"). A Bayesian LSTM + Bayesian linear head is trained
on a noisy synthetic signal (or a user CSV/npz series) with the Gaussian
NLL + KL/batch ELBO; evaluation reports MC predictive mean, aleatoric
spread, and epistemic (MC) spread per horizon step.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from bayesian_torch_tpu.parallel import mc_forward
from bayesian_torch_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
from bayesian_torch_tpu.layers.base_variational_layer import make_rngs


def build_parser():
    p = argparse.ArgumentParser(description="Bayesian LSTM time series")
    p.add_argument("--estimator", type=str, default="Reparameterization",
                   choices=["Reparameterization", "Flipout"])
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--num_monte_carlo", type=int, default=20)
    p.add_argument("--save_dir", type=str, default="./checkpoint/lstm")
    p.add_argument("--data-npz", type=str, default=None,
                   help="npz with 1-D array 'series'")
    return p


def make_series(n=20000, seed=0):
    """Synthetic regime-switching noisy sinusoid."""
    rs = np.random.RandomState(seed)
    t = np.arange(n) * 0.05
    y = (np.sin(t) + 0.5 * np.sin(2.7 * t)
         + 0.15 * rs.randn(n)
         + 0.4 * np.sin(0.11 * t) ** 2)
    return y.astype(np.float32)


def windows(series, seq_len, batch_size, rs):
    starts = rs.randint(0, len(series) - seq_len - 1, size=batch_size)
    x = np.stack([series[s:s + seq_len] for s in starts])[..., None]
    y = np.stack([series[s + 1:s + seq_len + 1] for s in starts])[..., None]
    return x, y


class BayesianLSTMRegressor(nnx.Module):
    """LSTM(1 -> H) + Linear(H -> 2): per-step mean and log-variance
    (heteroscedastic head for aleatoric uncertainty)."""

    def __init__(self, hidden, estimator, rngs):
        import bayesian_torch_tpu.layers as bl
        LSTM = getattr(bl, "LSTM" + estimator)
        Lin = getattr(bl, "Linear" + estimator)
        self.lstm = LSTM(1, hidden, rngs=rngs)
        self.head = Lin(hidden, 2, rngs=rngs)

    def __call__(self, x):
        h_seq, _, kl1 = self.lstm(x)
        out, kl2 = self.head(h_seq)
        mean = out[..., :1]
        logvar = out[..., 1:]
        return jnp.concatenate([mean, logvar], axis=-1), kl1 + kl2


def gaussian_nll(pred, target):
    mean, logvar = pred[..., :1], pred[..., 1:]
    return 0.5 * (jnp.exp(-logvar) * (target - mean) ** 2 + logvar).mean()


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.data_npz:
        series = np.load(args.data_npz)["series"].astype(np.float32)
    else:
        series = make_series()
    n_test = len(series) // 5
    train_series, test_series = series[:-n_test], series[-n_test:]

    model = BayesianLSTMRegressor(
        args.hidden, args.estimator,
        make_rngs(args.seed, noise_seed=args.seed + 1))
    ckpt = os.path.join(args.save_dir, f"lstm_{args.estimator.lower()}")

    @nnx.jit
    def train_step(model, optimizer, x, y):
        def loss_fn(model):
            pred, kl = model(x)
            return gaussian_nll(pred, y) + kl / x.shape[0]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    if args.mode == "train":
        optimizer = nnx.Optimizer(model, optax.adam(args.lr),
                                  wrt=nnx.Param)
        rs = np.random.RandomState(args.seed)
        for step in range(args.steps):
            x, y = windows(train_series, args.seq_len, args.batch_size, rs)
            loss = train_step(model, optimizer, jnp.asarray(x),
                              jnp.asarray(y))
            if step % 50 == 0:
                print(f"step {step}: nll+kl {float(loss):.4f}")
        save_checkpoint(model, ckpt)
    else:
        load_checkpoint(model, ckpt)

    # MC predictive evaluation on held-out windows
    rs = np.random.RandomState(123)
    x, y = windows(test_series, args.seq_len, args.batch_size, rs)

    @nnx.jit
    def mc_eval(model, x):
        preds, _ = mc_forward(model, x, args.num_monte_carlo)
        return preds  # (MC, B, T, 2)

    preds = np.asarray(mc_eval(model, jnp.asarray(x)))
    means = preds[..., 0]
    ale = np.exp(preds[..., 1]).mean(0) ** 0.5      # aleatoric std
    epi = means.std(0)                              # epistemic std
    pred_mean = means.mean(0)
    rmse = float(np.sqrt(((pred_mean - y[..., 0]) ** 2).mean()))
    print(f"test RMSE {rmse:.4f} | aleatoric std {ale.mean():.4f} | "
          f"epistemic std {epi.mean():.4f}")
    # calibration: fraction of targets within 2 total-std
    total = np.sqrt(ale ** 2 + epi ** 2)
    cover = float((np.abs(pred_mean - y[..., 0]) < 2 * total).mean())
    print(f"2-sigma coverage {cover * 100:.1f}% (ideal ~95%)")
    return rmse


if __name__ == "__main__":
    main()
