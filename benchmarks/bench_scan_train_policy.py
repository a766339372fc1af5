"""Selective-checkpoint scan training (VERDICT r4 #4).

Round 4 measured frozen-BN MC4 training through the scan emission with
FULL remat at 226.7 ms — losing to the vmapped frozen-BN step
(207.8 ms) because remat re-runs each draw's full forward in the
backward (~4 x 10 ms of extra conv FLOPs). This bench tries the middle
ground: `jax.checkpoint_policies.save_only_these_names('conv_out')`
keeps every conv output (checkpoint_name'd in ops/conv.py) and
recomputes only the BN/ReLU/add elementwise between convs — the
backward then needs NO extra conv FLOPs while the saved set stays
~2.5 GB/draw (fits MC-4 bs128).

Configs (all bf16 NHWC RN50, frozen-BN ELBO step, SGD+momentum):
  - scan + save_only('conv_out'), bs128 / bs256
  - scan + full remat (round-4 number, re-measure)
  - vmap frozen-BN (the 207.8 ms baseline, re-measure)

Usage: python benchmarks/bench_scan_train_policy.py [--mc 4]
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


def build():
    from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
        import resnet50
    from bayesian_torch_tpu.utils import freeze_batchnorm

    model = resnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                   noise=jax.random.key(1, impl="rbg")),
                     data_format="NHWC")
    model.train()
    freeze_batchnorm(model)
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    return model


def train_time(batch, num_mc, emission, remat_policy=None):
    from bayesian_torch_tpu.parallel import mc_forward

    model = build()
    opt = nnx.Optimizer(model, optax.sgd(0.01, 0.9), wrt=nnx.Param)
    gd, st = nnx.split((model, opt))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(st, x, y):
        model, opt = nnx.merge(gd, st)

        def loss_fn(model):
            outs, kl = mc_forward(model, x, num_mc, emission=emission,
                                  remat_policy=remat_policy)
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
    p = argparse.ArgumentParser()
    p.add_argument("--mc", type=int, default=4)
    p.add_argument("--configs", default="pol128,pol256,full128,vmap128")
    args = p.parse_args()
    S = args.mc
    pol = jax.checkpoint_policies.save_only_these_names("conv_out")

    runs = {
        "pol128": ("scan save_only(conv_out) bs128",
                   lambda: train_time(128, S, "scan", pol)),
        "pol256": ("scan save_only(conv_out) bs256",
                   lambda: train_time(256, S, "scan", pol)),
        "full128": ("scan full-remat bs128 (r4 re-measure)",
                    lambda: train_time(128, S, "scan", None)),
        "vmap128": ("vmap frozen-BN bs128 (r4 baseline)",
                    lambda: train_time(128, S, "vmap", None)),
    }
    for k in args.configs.split(","):
        tag, fn = runs[k]
        try:
            t = fn()
            bs = 256 if "256" in k else 128
            log(f"train MC{S} {tag}: {t * 1e3:.2f} ms "
                f"({bs / t:.1f} imgs/s)")
        except Exception as e:  # noqa: BLE001 - report OOMs per config
            log(f"train MC{S} {tag}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
