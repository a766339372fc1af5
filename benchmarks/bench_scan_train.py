"""Scan-emission TRAINING experiments (round 4, post-north-star).

Two questions, both answered by measurement on the real chip:

1. Frozen-BN MC4 training through the scan emission — does running
   each draw's fwd+bwd in the det-form HLO beat the vmapped frozen-BN
   step (206.9 ms bs128, BASELINE.md)? The scan body is nnx.remat'd
   (parallel/mc.py): without it the scanned VJP saves every draw's
   activations; with it each draw's forward re-runs in the backward
   (~1/3 extra FLOPs). The vmapped path saves all draws' activations
   but emits 5-D conv forms. Which tax is smaller is an empirical
   question.

2. Scan UNROLL sweep (eval): the scan carry is just `x` (invariant),
   so iterations are data-independent — `unroll>1` hands XLA multiple
   draws' det-form graphs per loop step to interleave. Does it shave
   the residual 3% (113.07 scan vs 109.7 det-bound)?

Usage: python benchmarks/bench_scan_train.py [--what train|unroll|all]
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402

sys.path.insert(0, "/root/repo")
from benchmarks._timing import step_time  # noqa: E402

BATCH = 128
IMG = 224


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(kind="bayes"):
    import bayesian_torch_tpu.models.bayesian.resnet_variational_large \
        as zoo

    model = zoo.resnet50(
        rngs=nnx.Rngs(params=jax.random.key(0),
                      noise=jax.random.key(1, impl="rbg")),
        data_format="NHWC")
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    return model


def bench_train(num_mc=4):
    """Frozen-BN MC train step: vmap vs scan emission."""
    from bayesian_torch_tpu.parallel import mc_forward
    from bayesian_torch_tpu.utils import freeze_batchnorm

    x = jax.random.normal(jax.random.key(7), (BATCH, IMG, IMG, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(8), (BATCH,), 0, 1000)

    for emission in ("vmap", "scan"):
        model = build()
        model.train()
        freeze_batchnorm(model)
        opt = nnx.Optimizer(model, optax.sgd(0.01, 0.9), wrt=nnx.Param)
        gd, st = nnx.split((model, opt))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(st, x, y, emission=emission, gd=gd):
            model, opt = nnx.merge(gd, st)

            def loss_fn(model):
                outs, kl = mc_forward(model, x, num_mc,
                                      emission=emission)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    outs.mean(0).astype(jnp.float32), y).mean()
                return ce + kl / BATCH

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            opt.update(model, grads)
            _, st = nnx.split((model, opt))
            return loss, st

        box = [st]

        def wrapped():
            loss, box[0] = step(box[0], x, y)
            return loss

        t = step_time(wrapped)
        log(f"train frozen-BN MC{num_mc} bs{BATCH} emission={emission}: "
            f"{t * 1e3:.2f} ms ({BATCH / t:.1f} imgs/s)")


def bench_unroll(num_mc=10):
    """Eval scan with different unroll factors."""
    from bayesian_torch_tpu.parallel.mc import _mc_forward_scan

    model = build()
    model.eval()
    gd, st = nnx.split(model)
    x = jax.random.normal(jax.random.key(42), (BATCH, IMG, IMG, 3),
                          jnp.float32)

    for unroll in (1, 2, 5):
        @jax.jit
        def fwd(st, x, unroll=unroll):
            m = nnx.merge(gd, st)
            return _mc_forward_scan(m, x, num_mc, False,
                                    unroll=unroll).mean()

        t = step_time(fwd, st, x)
        log(f"eval scan MC{num_mc} bs{BATCH} unroll={unroll}: "
            f"{t * 1e3:.2f} ms ({BATCH / t:.1f} imgs/s)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="all",
                   choices=["train", "unroll", "all"])
    args = p.parse_args()
    if args.what in ("train", "all"):
        bench_train()
    if args.what in ("unroll", "all"):
        bench_unroll()


if __name__ == "__main__":
    main()
