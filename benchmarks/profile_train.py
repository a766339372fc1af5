"""Annotated per-fusion device profile of the ELBO train step.

Round-3 follow-up: bench.py's train_mc4 step measures 282 ms at bs=128
while 3x the forward cost at the same MC/batch structure bounds it near
~161 ms (fwd MC-10 is 134.5 ms => MC-4 ~ 53.8 ms).  This tool builds
the EXACT bench.py train step (ELBO, donated state, SGD+momentum),
traces it on the device, and cross-references every fusion against the
optimized HLO so conv work hiding in ``fusion.N`` names is attributed —
the same methodology as profile_annotate.py used for inference.

Usage: python benchmarks/profile_train.py [det|mc1|mc4]... (default mc4)
One TPU job at a time (see CLAUDE.md).
"""

from __future__ import annotations

import functools
import sys
from collections import Counter

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402

from benchmarks._timing import step_time  # noqa: E402
from benchmarks.profile_annotate import classify, parse_hlo  # noqa: E402

BATCH = 128
IMG = 224
TRACE_STEPS = 4


def _build(kind, batch=BATCH, remat=False):
    """Reproduce bench.py::_train_step_time exactly (non-donated copy
    for tracing: donation would invalidate the reusable state arg)."""
    from bayesian_torch_tpu.parallel import mc_forward

    if kind == "det":
        from bayesian_torch_tpu.models.deterministic.resnet_large import (
            resnet50,
        )
        model = resnet50(rngs=nnx.Rngs(params=0, noise=1),
                         data_format="NHWC", remat_blocks=remat)
    else:
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
        model = resnet50(rngs=nnx.Rngs(
            params=jax.random.key(0),
            noise=jax.random.key(1, impl="rbg")), data_format="NHWC",
            remat_blocks=remat)
    num_mc = {"det": 0, "mc1": 1, "mc4": 4}[kind]
    model.train()
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    opt = nnx.Optimizer(model, optax.sgd(0.01, 0.9), wrt=nnx.Param)
    gd, st = nnx.split((model, opt))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(st, x, y):
        model, opt = nnx.merge(gd, st)

        def loss_fn(model):
            if num_mc == 0:
                out = model(x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    out.astype(jnp.float32), y).mean()
            outs, kl = mc_forward(model, x, num_mc)
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
    return step, st, x, y


def time_only(kind, remat, batch=BATCH):
    """Slope-timed step, no trace — for the remat A/B."""
    step, st, x, y = _build(kind, batch=batch, remat=remat)
    box = [st]

    def wrapped():
        loss, box[0] = step(box[0], x, y)
        return loss

    t = step_time(wrapped)
    print(f"train {kind} bs{batch} remat={remat}: {t * 1e3:.2f} ms "
          f"({batch / t:.1f} imgs/s)")
    return t


def profile(kind, remat=False):
    from bayesian_torch_tpu.utils.profiling import summarize_trace, trace

    step, st, x, y = _build(kind, remat=remat)

    box = [st]

    def wrapped():
        loss, box[0] = step(box[0], x, y)
        return loss

    t = step_time(wrapped)
    hlo = step.lower(box[0], x, y).compile().as_text()
    with open(f"/tmp/hlo_train_{kind}.txt", "w") as f:
        f.write(hlo)
    desc = parse_hlo(hlo)
    logdir = f"/tmp/trace_train_{kind}"
    with trace(logdir):
        for _ in range(TRACE_STEPS):
            r = wrapped()
        float(r)
    rows = summarize_trace(logdir, top=4000)
    total = sum(ms for _, ms in rows) / TRACE_STEPS
    print(f"== train {kind} bs{BATCH}: step {t * 1e3:.2f} ms, "
          f"device sum {total:.2f} ms/step ==")
    buckets = Counter()
    for name, ms in rows:
        d = desc.get(name, name)
        buckets[classify(name, d)] += ms / TRACE_STEPS
    print("-- buckets --")
    for b, ms in buckets.most_common():
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}%  {b}")
    print("-- top 40 --")
    for name, ms in rows[:40]:
        per = ms / TRACE_STEPS
        print(f"{per:8.3f} {100 * per / total:5.1f}%  {name[:28]:28} "
              f"{desc.get(name, '?')[:110]}")


if __name__ == "__main__":
    args = sys.argv[1:] or ["mc4"]
    for a in args:
        if a.startswith("time:"):  # time:mc4[:full|:conv_out|:none][:batch]
            _, kind, *rest = a.split(":")
            remat = {"full": True, "conv_out": "conv_out", "none": False,
                     "": False}[rest[0] if rest else ""]
            batch = int(rest[1]) if len(rest) > 1 else BATCH
            time_only(kind, remat=remat, batch=batch)
        elif a.startswith("remat:"):  # remat:mc4 / remat:mc4:conv_out
            _, kind, *rest = a.split(":")
            profile(kind, remat="conv_out" if rest else True)
        else:
            profile(a)
