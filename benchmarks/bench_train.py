"""Bayesian ResNet-50 ELBO train-step times (det / MC=1 / MC=4).

Round-1 numbers (BASELINE.md): det 23.7 ms, MC=1 16.5 ms, MC=4 85 ms
(including the extra BN-stat refresh forward). The vmap-native BN EMA
removed the refresh forward; this script quantifies the MC=4 win.
"""

import functools
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402

from benchmarks._timing import step_time  # noqa: E402

BATCH = 32
IMG = 224


def _set_compute_dtype(model, dtype):
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = dtype


def bayes_step_fn(num_mc):
    from bayesian_torch_tpu.models.bayesian.resnet_variational_large import (
        resnet50,
    )
    from bayesian_torch_tpu.parallel import mc_forward

    model = resnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                   noise=jax.random.key(1, impl="rbg")))
    model.train()
    _set_compute_dtype(model, jnp.bfloat16)
    opt = nnx.Optimizer(model, optax.sgd(0.01, 0.9), wrt=nnx.Param)
    gd, st = nnx.split((model, opt))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(st, x, y):
        model, opt = nnx.merge(gd, st)

        def loss_fn(model):
            outs, kl = mc_forward(model, x, num_mc)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                outs.mean(0).astype(jnp.float32), y).mean()
            return ce + kl / BATCH

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        _, st = nnx.split((model, opt))
        return loss, st

    def wrapped(st_box, x, y):
        loss, st_box[0] = step(st_box[0], x, y)
        return loss

    return wrapped, [st]


def main():
    x = jax.random.normal(jax.random.key(7), (BATCH, 3, IMG, IMG),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(8), (BATCH,), 0, 1000)

    for num_mc in (1, 4):
        fn, box = bayes_step_fn(num_mc)
        t = step_time(lambda: fn(box, x, y))
        print(json.dumps({"metric": f"bayes_resnet50_train_step_mc{num_mc}",
                          "value": round(t * 1e3, 2), "unit": "ms",
                          "batch": BATCH}))


if __name__ == "__main__":
    main()
