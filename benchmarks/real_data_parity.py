"""Real-data system-level parity: ours vs the reference, same protocol.

BASELINE.json's "predictive mean/NLL parity" target was only ever
covered at layer level (fixed-eps golden tests); this trains BOTH
frameworks end-to-end on the one real dataset available in this
no-egress environment (sklearn's digits, 1797 8x8 images — MNIST and
CIFAR are not on disk and cannot be fetched) and compares accuracy /
NLL / predictive entropy of the MC-predictive posterior.

Protocol (identical on both sides):
- Bayesian MLP 64->64->10 (LinearReparameterization x2, ReLU),
  prior N(0,1), posterior rho init -3.
- BOTH models start from the SAME posterior init (ours copied into the
  torch reference layers), train 30 epochs Adam(1e-2), batch 100,
  MC=1 ELBO (CE + KL/batch), identical epoch shuffles (shared numpy
  permutations). Only the weight-noise streams differ (jax vs torch
  RNG) — exactly the variance the MC posterior is supposed to absorb.
- Eval: 20-MC predictive mean on the held-out 297 examples.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/real_data_parity.py
(tests/test_real_data_parity.py asserts the tolerances in CI.)
"""

from __future__ import annotations

import json

import numpy as np


def _data(seed=0):
    from sklearn.datasets import load_digits
    d = load_digits()
    x = (d.data / 16.0).astype(np.float32)
    y = d.target.astype(np.int64)
    rs = np.random.RandomState(seed)
    idx = rs.permutation(len(x))
    x, y = x[idx], y[idx]
    return (x[:1500], y[:1500]), (x[1500:], y[1500:])


EPOCHS = 30
BATCH = 100
LR = 1e-2
MC_EVAL = 20


def _epoch_orders(n, seed=123):
    rs = np.random.RandomState(seed)
    return [rs.permutation(n) for _ in range(EPOCHS)]


def train_ours(train, test, orders):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from bayesian_torch_tpu.layers import LinearReparameterization, make_rngs
    from bayesian_torch_tpu.parallel import mc_forward

    class MLP(nnx.Module):
        def __init__(self, rngs):
            self.fc1 = LinearReparameterization(64, 64, rngs=rngs)
            self.fc2 = LinearReparameterization(64, 10, rngs=rngs)

        def __call__(self, x):
            h, kl1 = self.fc1(x)
            out, kl2 = self.fc2(nnx.relu(h))
            return out, kl1 + kl2

    model = MLP(make_rngs(0, noise_seed=1))
    opt = nnx.Optimizer(model, optax.adam(LR), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x, y):
        def loss_fn(model):
            out, kl = model(x)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()
            return ce + kl / BATCH

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    x_tr, y_tr = train
    for order in orders:
        for i in range(0, len(order) - BATCH + 1, BATCH):
            sel = order[i:i + BATCH]
            step(model, opt, jnp.asarray(x_tr[sel]),
                 jnp.asarray(y_tr[sel]))

    model.eval()
    x_te, y_te = test
    probs = np.asarray(jax.nn.softmax(
        mc_forward(model, jnp.asarray(x_te), MC_EVAL,
                   return_kl=False), axis=-1))
    return model, _metrics(probs, y_te)


def _metrics(probs_mc, y):
    """probs_mc: (MC, N, C)."""
    mean = probs_mc.mean(axis=0)
    acc = float((mean.argmax(1) == y).mean())
    nll = float(-np.log(np.clip(mean[np.arange(len(y)), y], 1e-12,
                                None)).mean())
    ent = float(-(mean * np.log(np.clip(mean, 1e-12, None))
                  ).sum(1).mean())
    return {"accuracy": acc, "nll": nll, "pred_entropy": ent}


def train_reference(train, test, orders, ours_model):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from reference_oracle import copy_linear_params_to_torch, \
        import_reference
    import_reference()
    import torch
    import torch.nn.functional as F
    from bayesian_torch.layers import LinearReparameterization as RefLin

    torch.manual_seed(7)

    class RefMLP(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = RefLin(64, 64)
            self.fc2 = RefLin(64, 10)

        def forward(self, x):
            h, kl1 = self.fc1(x)
            out, kl2 = self.fc2(F.relu(h))
            return out, kl1 + kl2

    ref = RefMLP()
    # identical starting posterior
    copy_linear_params_to_torch(ours_init.fc1, ref.fc1)
    copy_linear_params_to_torch(ours_init.fc2, ref.fc2)

    opt = torch.optim.Adam(ref.parameters(), lr=LR)
    x_tr, y_tr = train
    for order in orders:
        for i in range(0, len(order) - BATCH + 1, BATCH):
            sel = order[i:i + BATCH]
            xb = torch.from_numpy(x_tr[sel])
            yb = torch.from_numpy(y_tr[sel])
            out, kl = ref(xb)
            loss = F.cross_entropy(out, yb) + kl / BATCH
            opt.zero_grad()
            loss.backward()
            opt.step()

    ref.eval()
    x_te, y_te = test
    with torch.no_grad():
        probs = np.stack([
            F.softmax(ref(torch.from_numpy(x_te))[0], dim=-1).numpy()
            for _ in range(MC_EVAL)])
    return _metrics(probs, y_te)


ours_init = None


def run():
    global ours_init
    train, test = _data()
    orders = _epoch_orders(len(train[0]))

    # build ours FIRST (its init seeds both frameworks)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bayesian_torch_tpu.layers import LinearReparameterization, \
        make_rngs
    from flax import nnx

    class MLP(nnx.Module):
        def __init__(self, rngs):
            self.fc1 = LinearReparameterization(64, 64, rngs=rngs)
            self.fc2 = LinearReparameterization(64, 10, rngs=rngs)

        def __call__(self, x):
            h, kl1 = self.fc1(x)
            out, kl2 = self.fc2(nnx.relu(h))
            return out, kl1 + kl2

    ours_init = MLP(make_rngs(0, noise_seed=1))

    _, ours = train_ours(train, test, orders)
    ref = train_reference(train, test, orders, ours_init)
    return {"ours": ours, "reference": ref}


if __name__ == "__main__":
    print(json.dumps(run(), indent=2))
