"""On-chip throughput for the reference's canonical eval configs.

VERDICT r2 item 4: the reference's own test scripts define these
workloads, and BASELINE.md had TPU numbers only for the RN50 flagship.
Measured here (one JSON line each):

- config #1: SCNN MNIST eval, bs=10000, 20 MC samples
  (reference scripts/test_bayesian_mnist.sh)
- config #2: CIFAR ResNet-20 eval, bs=1000, 50 MC samples
  (reference scripts/test_bayesian_cifar.sh:1-8)
- config #4: Bayesian LSTM time-series, bs=128, seq=64, hidden=64,
  MC=20 eval (examples/main_bayesian_lstm_timeseries.py defaults)

Usage: python benchmarks/bench_configs.py [mnist|cifar|lstm]...
One TPU job at a time (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from benchmarks._timing import step_time  # noqa: E402


def _bf16(model):
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16


def _mc_eval_fn(model, num_mc, emission="vmap"):
    from bayesian_torch_tpu.parallel import mc_forward
    gd, state = nnx.split(model)

    @jax.jit
    def fwd(state, x):
        m = nnx.merge(gd, state)
        return mc_forward(m, x, num_mc, return_kl=False,
                          emission=emission).mean()

    return fwd, state


def bench_mnist():
    from bayesian_torch_tpu.layers.base_variational_layer import make_rngs
    from bayesian_torch_tpu.models.bayesian.simple_cnn_variational import (
        SCNN,
    )
    from bayesian_torch_tpu.parallel import mc_forward
    bs, mc, chunk = 10000, 20, 1000
    model = SCNN(rngs=make_rngs(0, noise_seed=1))
    model.eval()
    _bf16(model)
    gd, state = nnx.split(model)

    # the full (20 MC, 10000) batch is ~15 GB of activations — more
    # than one v5e's HBM. The reference runs this config as a python
    # MC loop on CPU; the TPU equivalent streams the batch through the
    # compiled chunk program (async dispatches pipeline on-device).
    x = jax.random.normal(jax.random.key(2), (bs, 1, 28, 28), jnp.float32)
    chunks = [x[i:i + chunk] for i in range(0, bs, chunk)]

    ts = {}
    for emission in ("vmap", "scan"):
        @jax.jit
        def chunk_fwd(state, xc, emission=emission):
            m = nnx.merge(gd, state)
            return mc_forward(m, xc, mc, return_kl=False,
                              emission=emission).mean()

        def fwd(state, _x, chunk_fwd=chunk_fwd):
            for xc in chunks:
                r = chunk_fwd(state, xc)
            return r

        ts[emission] = step_time(fwd, state, x)
    best = min(ts, key=ts.get)
    t = ts[best]
    print(json.dumps({
        "metric": "scnn_mnist_eval_mc20_bs10000",
        "value": round(bs / t, 1), "unit": "imgs/sec/chip",
        "ms_per_batch": round(t * 1e3, 2), "emission": best,
        "ms_vmap": round(ts["vmap"] * 1e3, 2),
        "ms_scan": round(ts["scan"] * 1e3, 2),
        "config": "reference scripts/test_bayesian_mnist.sh"}))


def bench_cifar():
    from bayesian_torch_tpu.layers.base_variational_layer import make_rngs
    from bayesian_torch_tpu.models.bayesian.resnet_variational import (
        resnet20,
    )
    bs, mc = 1000, 50
    model = resnet20(rngs=make_rngs(0, noise_seed=1))
    model.eval()
    _bf16(model)
    x = jax.random.normal(jax.random.key(3), (bs, 3, 32, 32), jnp.float32)
    ts = {}
    for emission in ("vmap", "scan"):
        fwd, state = _mc_eval_fn(model, mc, emission)
        ts[emission] = step_time(fwd, state, x)
    best = min(ts, key=ts.get)
    t = ts[best]
    print(json.dumps({
        "metric": "cifar_resnet20_eval_mc50_bs1000",
        "value": round(bs / t, 1), "unit": "imgs/sec/chip",
        "ms_per_batch": round(t * 1e3, 2), "emission": best,
        "ms_vmap": round(ts["vmap"] * 1e3, 2),
        "ms_scan": round(ts["scan"] * 1e3, 2),
        "config": "reference scripts/test_bayesian_cifar.sh"}))


def bench_lstm():
    from bayesian_torch_tpu.layers import LinearReparameterization
    from bayesian_torch_tpu.layers.base_variational_layer import make_rngs
    from bayesian_torch_tpu.layers.variational_layers.rnn_variational import (
        LSTMReparameterization,
    )

    bs, seq, hidden, mc = 128, 64, 64, 20

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.lstm = LSTMReparameterization(1, hidden, rngs=rngs)
            self.head = LinearReparameterization(hidden, 1, rngs=rngs)

        def __call__(self, x):
            out, _, kl1 = self.lstm(x)
            out, kl2 = self.head(out)
            return out, kl1 + kl2

    model = Net(make_rngs(0, noise_seed=1))
    model.eval()
    _bf16(model)
    x = jax.random.normal(jax.random.key(4), (bs, seq, 1), jnp.float32)
    ts = {}
    for emission in ("vmap", "scan"):
        fwd, state = _mc_eval_fn(model, mc, emission)
        ts[emission] = step_time(fwd, state, x)
    best = min(ts, key=ts.get)
    t = ts[best]
    print(json.dumps({
        "metric": "bayesian_lstm_eval_mc20_bs128_seq64",
        "value": round(bs * seq / t, 1), "unit": "steps/sec/chip",
        "ms_per_batch": round(t * 1e3, 2), "emission": best,
        "ms_vmap": round(ts["vmap"] * 1e3, 2),
        "ms_scan": round(ts["scan"] * 1e3, 2),
        "config": "examples/main_bayesian_lstm_timeseries.py defaults"}))


def main():
    which = sys.argv[1:] or ["mnist", "cifar", "lstm"]
    for w in which:
        {"mnist": bench_mnist, "cifar": bench_cifar,
         "lstm": bench_lstm}[w]()


if __name__ == "__main__":
    main()
