"""Round-4 follow-ups to the scan-over-draws emission win.

Measures on the real chip:
1. Flipout RN50 MC-10 eval: scan emission vs the structured
   (channel-tiled) path that round 3 shipped (444 imgs/s) vs vmap.
2. Reparam RN50 MC-4 frozen-BN ELBO train step: scan vs vmap emission
   (freeze_batchnorm puts BN in eval mode, so the scan guard passes
   and gradients flow through the draw loop).

Usage: python benchmarks/bench_scan_more.py [--mc 10] [--batch 128]
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(kind):
    if kind == "flipout":
        from bayesian_torch_tpu.models.bayesian.resnet_flipout_large \
            import resnet50
    else:
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
    model = resnet50(
        rngs=nnx.Rngs(params=jax.random.key(0),
                      noise=jax.random.key(1, impl="rbg")),
        data_format="NHWC")
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    return model


def eval_flipout(args):
    from bayesian_torch_tpu.parallel import mc_forward

    x = jax.random.normal(jax.random.key(42),
                          (args.batch, 224, 224, 3), jnp.float32)
    model = build("flipout")
    model.eval()
    gd, st = nnx.split(model)

    for mode, kw in (("scan", dict(emission="scan")),
                     ("structured", dict(structured=True)),
                     ("vmap", dict())):
        @jax.jit
        def fwd(st, x, kw=kw):
            m = nnx.merge(gd, st)
            return mc_forward(m, x, args.mc, return_kl=False, **kw).mean()

        t = step_time(fwd, st, x)
        log(f"flipout {mode:10s} mc{args.mc} bs{args.batch}: "
            f"{t*1e3:8.2f} ms ({args.batch/t:7.1f} imgs/s)")


def train_frozenbn(args):
    from bayesian_torch_tpu.parallel import mc_forward
    from bayesian_torch_tpu.utils import freeze_batchnorm

    num_mc = 4
    bs = args.batch
    x = jax.random.normal(jax.random.key(7), (bs, 224, 224, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(8), (bs,), 0, 1000)

    for emission in ("vmap", "scan"):
        model = build("reparam")
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
                return ce + kl / bs

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            opt.update(model, grads)
            _, st = nnx.split((model, opt))
            return loss, st

        box = [st]

        def wrapped():
            loss, box[0] = step(box[0], x, y)
            return loss

        t = step_time(wrapped)
        log(f"train mc4 frozenbn {emission:5s} bs{bs}: {t*1e3:8.2f} ms "
            f"({bs/t:7.1f} imgs/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--only", choices=["eval", "train"], default=None)
    args = ap.parse_args()
    if args.only in (None, "eval"):
        eval_flipout(args)
    if args.only in (None, "train"):
        train_frozenbn(args)


if __name__ == "__main__":
    main()
