"""Round-5 per-fusion profiles (VERDICT r4 #2/#4): the scanned flipout
body and the training steps.

The scanned flipout flagship (257.6 ms MC-10 bs128) sits at 0.818x the
2x-reparam equal-structure bound (210.6 ms) with ~47 ms unattributed.
Profile the while-loop body per-fusion and bucket it: convs vs sign
multiplies (x*s_in, mean+pert*s_out) vs in-body sampling vs layout.

Usage: python benchmarks/profile_r05.py [flipout_scan|reparam_scan|
       train_mc4|train_flipout_mc4]...
"""

from __future__ import annotations

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
NUM_MC = 10
IMG = 224
TRACE_STEPS = 2


def _build(kind, train=False):
    if kind == "flipout":
        from bayesian_torch_tpu.models.bayesian.resnet_flipout_large \
            import resnet50
    else:
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
    model = resnet50(rngs=nnx.Rngs(
        params=jax.random.key(0),
        noise=jax.random.key(1, impl="rbg")), data_format="NHWC")
    model.train() if train else model.eval()
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    return model


def _bucket(name):
    n = name.lower()
    if "convolution" in n:
        return "conv fusions"
    if "rng" in n:
        return "rng"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "dynamic-update" in n or "dynamic-slice" in n:
        return "loop slice/stack"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "elementwise fusions"
    return "other"


def _profile(tag, fwd, *args):
    from collections import Counter

    from bayesian_torch_tpu.utils.profiling import summarize_trace, trace

    t = step_time(fwd, *args)
    logdir = f"/tmp/trace_r05_{tag}"
    with trace(logdir):
        for _ in range(TRACE_STEPS):
            r = fwd(*args)
        float(r if not isinstance(r, tuple) else r[0])
    rows = summarize_trace(logdir, top=4000)
    total = sum(ms for _, ms in rows) / TRACE_STEPS
    print(f"\n== {tag}: step {t * 1e3:.2f} ms (slope), device-op sum "
          f"{total:.2f} ms/step ==", flush=True)
    buckets = Counter()
    for name, ms in rows:
        buckets[_bucket(name)] += ms / TRACE_STEPS
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, ms in rows[:30]:
        per = ms / TRACE_STEPS
        print(f"{per:9.3f}  {100 * per / total:5.1f}  {name[:100]}")
    print("-- buckets --")
    for b, ms in buckets.most_common():
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {b}")
    return t


def profile_scan(kind):
    from bayesian_torch_tpu.parallel import mc_forward

    model = _build(kind)
    gd, st = nnx.split(model)

    @jax.jit
    def fwd(st, x):
        m = nnx.merge(gd, st)
        return mc_forward(m, x, NUM_MC, return_kl=False,
                          emission="scan").astype(jnp.float32).mean()

    x = jax.random.normal(jax.random.key(42), (BATCH, IMG, IMG, 3),
                          jnp.float32)
    _profile(f"{kind}_scan", fwd, st, x)


def profile_train(kind, num_mc=4):
    from bayesian_torch_tpu.parallel import mc_forward

    model = _build("flipout" if "flipout" in kind else "reparam",
                   train=True)
    opt = nnx.Optimizer(model, optax.sgd(0.01, 0.9), wrt=nnx.Param)
    gd, st = nnx.split((model, opt))

    @jax.jit
    def step(st, x, y):
        model, opt = nnx.merge(gd, st)

        def loss_fn(model):
            outs, kl = mc_forward(model, x, num_mc,
                                  structured=("flipout" in kind))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                outs.mean(0).astype(jnp.float32), y).mean()
            return ce + kl / BATCH

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        # MUST return the updated state: with only `loss` as output,
        # XLA dead-code-eliminates the entire backward pass + optimizer
        # update and the "train" profile silently measures forward-only
        # (observed: 135.7 ms vs the real 431 ms flipout MC4 step).
        _, st = nnx.split((model, opt))
        return loss, st

    x = jax.random.normal(jax.random.key(7), (BATCH, IMG, IMG, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(8), (BATCH,), 0, 1000)

    def wrapped(st, x, y):
        # st stays a declared output of the compiled step (so the
        # backward/update cannot be DCE'd); the profiler only needs
        # the scalar loss to force execution.
        loss, _ = step(st, x, y)
        return loss

    # non-donated state for repeat runs inside the profiler
    _profile(kind, wrapped, st, x, y)


def main():
    kinds = sys.argv[1:] or ["flipout_scan"]
    for kind in kinds:
        if kind == "flipout_scan":
            profile_scan("flipout")
        elif kind == "reparam_scan":
            profile_scan("reparam")
        elif kind == "train_mc4":
            profile_train("train_mc4")
        elif kind == "train_flipout_mc4":
            profile_train("train_flipout_mc4")


if __name__ == "__main__":
    main()
