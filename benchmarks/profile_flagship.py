"""Per-op device profile of the flagship steps + raw-conv ceiling.

VERDICT r2 items 1+2: commit a per-op trace table of the flagship
(reparam MC-10) and Flipout steps naming where the time goes, and bench
raw ``lax.conv_general_dilated`` at the dominant ResNet-50 shapes —
exactly the physical convs vmap produces (per-draw weights batch-merge
into feature groups) — to establish whether the model step is at XLA's
conv ceiling.

Usage: python benchmarks/profile_flagship.py [bayes|flipout|det|rawconv]...
(defaults to all). One TPU job at a time (see CLAUDE.md).
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from benchmarks._timing import step_time  # noqa: E402

BATCH = 128
NUM_MC = 10
IMG = 224
TRACE_STEPS = 4


def _set_compute_dtype(model, dtype):
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = dtype


def _build(kind):
    from bayesian_torch_tpu.parallel import mc_forward

    if kind == "flipout":
        from bayesian_torch_tpu.models.bayesian.resnet_flipout_large import (
            resnet50,
        )
    elif kind == "bayes":
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
    else:
        from bayesian_torch_tpu.models.deterministic.resnet_large import (
            resnet50,
        )
    if kind == "det":
        model = resnet50(rngs=nnx.Rngs(params=0, noise=1),
                         data_format="NHWC")
        shape = (BATCH * NUM_MC, IMG, IMG, 3)
    else:
        model = resnet50(rngs=nnx.Rngs(
            params=jax.random.key(0),
            noise=jax.random.key(1, impl="rbg")), data_format="NHWC")
        shape = (BATCH, IMG, IMG, 3)
    model.eval()
    _set_compute_dtype(model, jnp.bfloat16)
    graphdef, state = nnx.split(model)

    if kind == "det":
        @jax.jit
        def fwd(state, x):
            return nnx.merge(graphdef, state)(x).mean()
    else:
        @jax.jit
        def fwd(state, x):
            model = nnx.merge(graphdef, state)
            return mc_forward(model, x, NUM_MC, return_kl=False).mean()

    x = jax.random.normal(jax.random.key(42), shape, jnp.float32)
    return fwd, state, x


def _bucket(name):
    n = name.lower()
    if "convolution" in n:
        return "conv fusions"
    if "rng" in n or "threefry" in n:
        return "rng"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "reduce" in n or "all-reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "elementwise fusions"
    return "other"


def profile_model(kind):
    from bayesian_torch_tpu.utils.profiling import (
        summarize_trace,
        trace,
    )

    fwd, state, x = _build(kind)
    t = step_time(fwd, state, x)
    logdir = f"/tmp/trace_{kind}"
    with trace(logdir):
        for _ in range(TRACE_STEPS):
            r = fwd(state, x)
        float(r)
    rows = summarize_trace(logdir, top=2000)
    total = sum(ms for _, ms in rows) / TRACE_STEPS
    print(f"\n== {kind}: step {t * 1e3:.2f} ms (slope), device-op sum "
          f"{total:.2f} ms/step ==")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    from collections import Counter
    buckets = Counter()
    for name, ms in rows:
        buckets[_bucket(name)] += ms / TRACE_STEPS
    for name, ms in rows[:25]:
        per = ms / TRACE_STEPS
        print(f"{per:9.3f}  {100 * per / total:5.1f}  {name[:90]}")
    print("-- buckets --")
    for b, ms in buckets.most_common():
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {b}")
    return t


# ResNet-50 convs: (in_ch, out_ch, k, stride, in_spatial, count).
# Stride rides the 3x3 (models/_large_resnet.py:111).
RN50_CONVS = [
    (3, 64, 7, 2, 224, 1),
    # layer1 @56
    (64, 64, 1, 1, 56, 1), (64, 64, 3, 1, 56, 3), (64, 256, 1, 1, 56, 4),
    (256, 64, 1, 1, 56, 2),
    # layer2
    (256, 128, 1, 1, 56, 1), (128, 128, 3, 2, 56, 1),
    (128, 512, 1, 1, 28, 4), (256, 512, 1, 2, 56, 1),
    (512, 128, 1, 1, 28, 3), (128, 128, 3, 1, 28, 3),
    # layer3
    (512, 256, 1, 1, 28, 1), (256, 256, 3, 2, 28, 1),
    (256, 1024, 1, 1, 14, 6), (512, 1024, 1, 2, 28, 1),
    (1024, 256, 1, 1, 14, 5), (256, 256, 3, 1, 14, 5),
    # layer4
    (1024, 512, 1, 1, 14, 1), (512, 512, 3, 2, 14, 1),
    (512, 2048, 1, 1, 7, 3), (1024, 2048, 1, 2, 14, 1),
    (2048, 512, 1, 1, 7, 2), (512, 512, 3, 1, 7, 2),
]


def profile_rawconv():
    """Bench each physical conv the MC-10 vmap emits: per-draw weights
    merge into feature groups (lhs (B,S,S,mc*I), rhs (k,k,I,mc*O),
    feature_group_count=mc), plus the flat det batch for comparison."""
    from bayesian_torch_tpu.utils.profiling import device_peak_tflops

    peak = device_peak_tflops()
    print(f"\n== raw conv ceiling (bf16, NHWC, peak {peak} TFLOP/s) ==")
    print(f"{'shape':>34} {'grouped(mc10)':>14} {'flat(det)':>10} "
          f"{'sol_g':>6} {'sol_f':>6}")
    dn = ("NHWC", "HWIO", "NHWC")
    tot_g = tot_f = tot_flops = 0.0
    for (ci, co, k, s, sp, count) in RN50_CONVS:
        pad = "SAME" if k > 1 else "VALID"
        if k == 7:
            pad = [(3, 3), (3, 3)]
        out_sp = -(-sp // s)
        flops = 2 * BATCH * NUM_MC * out_sp * out_sp * co * ci * k * k

        def run(b, groups, ci_, co_):
            x = jax.random.normal(jax.random.key(0), (b, sp, sp, ci_),
                                  jnp.bfloat16)
            w = jax.random.normal(jax.random.key(1),
                                  (k, k, ci_ // groups, co_), jnp.bfloat16)

            @jax.jit
            def f(x, w):
                return jax.lax.conv_general_dilated(
                    x, w, (s, s), pad, dimension_numbers=dn,
                    feature_group_count=groups,
                    preferred_element_type=jnp.bfloat16).sum()

            return step_time(f, x, w)

        tg = run(BATCH, NUM_MC, NUM_MC * ci, NUM_MC * co)
        tf_ = run(BATCH * NUM_MC, 1, ci, co)
        tot_g += tg * count
        tot_f += tf_ * count
        tot_flops += flops * count
        print(f"{ci:>5}->{co:<5} k{k} s{s} @{sp:<3} x{count:<2}"
              f"{tg * 1e3:>13.3f}ms {tf_ * 1e3:>8.3f}ms "
              f"{flops / tg / 1e12 / peak:>6.3f} "
              f"{flops / tf_ / 1e12 / peak:>6.3f}")
    print(f"sum: grouped {tot_g * 1e3:.2f} ms ({tot_flops / tot_g / 1e12:.1f}"
          f" TFLOP/s, {tot_flops / tot_g / 1e12 / peak:.3f} SoL), "
          f"flat {tot_f * 1e3:.2f} ms "
          f"({tot_flops / tot_f / 1e12 / peak:.3f} SoL)")


def main():
    kinds = sys.argv[1:] or ["bayes", "flipout", "det", "rawconv"]
    for kind in kinds:
        if kind == "rawconv":
            profile_rawconv()
        else:
            profile_model(kind)


if __name__ == "__main__":
    main()
