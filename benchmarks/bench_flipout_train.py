"""Flipout MC-4 training A/B (round 5).

The flipout train step (431-433 ms bs128, structured path, train-mode
BN) was profiled for the first time in round 5
(benchmarks/profile_r05.py train_flipout_mc4): rng is negligible
(0.16 ms), ~15% of device time is reduce fusions (BN batch stats +
grouped-conv backward reductions), the rest elementwise/conv fusions.
The one lever reparam training measured but flipout never did is
frozen-stat BN (`utils.freeze_batchnorm` cut reparam MC4 281.9 ->
206.9 ms, -27%, by removing the batch-stat passes the MC axis
multiplies). This bench measures it across the three flipout
emissions.

Configs (bf16 NHWC RN50-flipout MC-4 bs128 ELBO step, SGD+momentum,
donated state):
  - structured + train-BN        (bench.py baseline, ~431 ms)
  - structured + frozen-BN
  - vmap       + frozen-BN
  - scan       + frozen-BN       (full remat, like the reparam tie)

Reference semantics being accelerated: the MC train loop
/root/reference/bayesian_torch/examples/main_bayesian_mnist.py:27-38
over flipout layers (conv_flipout.py:370-433).

Usage: python benchmarks/bench_flipout_train.py [--mc 4] [--batch 128]
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

IMG = 224


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(frozen_bn):
    from bayesian_torch_tpu.models.bayesian.resnet_flipout_large \
        import resnet50
    from bayesian_torch_tpu.utils import freeze_batchnorm

    model = resnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                   noise=jax.random.key(1, impl="rbg")),
                     data_format="NHWC")
    model.train()
    if frozen_bn:
        freeze_batchnorm(model)
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    return model


def train_time(batch, num_mc, *, structured=False, emission="vmap",
               frozen_bn=False):
    from bayesian_torch_tpu.parallel import mc_forward

    model = build(frozen_bn)
    opt = nnx.Optimizer(model, optax.sgd(0.01, 0.9), wrt=nnx.Param)
    gd, st = nnx.split((model, opt))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(st, x, y):
        model, opt = nnx.merge(gd, st)

        def loss_fn(model):
            outs, kl = mc_forward(model, x, num_mc,
                                  structured=structured,
                                  emission=emission)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                outs.mean(0).astype(jnp.float32), y).mean()
            return ce + kl / batch

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        _, st = nnx.split((model, opt))
        return loss, st

    x = jax.random.normal(jax.random.key(7), (batch, IMG, IMG, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(8), (batch,), 0, 1000)
    box = [st]

    def wrapped():
        loss, box[0] = step(box[0], x, y)
        return loss

    return step_time(wrapped)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    b, mc = args.batch, args.mc

    configs = [
        ("structured train-BN (baseline)",
         dict(structured=True, frozen_bn=False)),
        ("structured frozen-BN", dict(structured=True, frozen_bn=True)),
        ("vmap frozen-BN",
         dict(emission="vmap", frozen_bn=True)),
        ("scan frozen-BN (full remat)",
         dict(emission="scan", frozen_bn=True)),
    ]
    for name, kw in configs:
        try:
            t = train_time(b, mc, **kw)
            log(f"flipout-train mc{mc} bs{b} {name}: {t * 1e3:.2f} ms "
                f"({b / t:.1f} imgs/s)")
        except Exception as e:  # keep the sweep going
            log(f"flipout-train mc{mc} bs{b} {name}: FAILED {e!r:.200}")
        jax.clear_caches()


if __name__ == "__main__":
    main()
