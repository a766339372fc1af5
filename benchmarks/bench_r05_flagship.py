"""Round-5 flagship experiments (VERDICT r4 #1): lock the north star.

Decomposes and attacks the two residuals of the presampled scan
emission (105.66 ms vs the 94.7-98.1 ms strictest det bound):

1. the 7.4 ms sampling cost vs the 4.56 ms erfinv generation floor
   (bench_normal_gen.py) — isolate the ACTUAL presample step cost and
   A/B generator layouts:
     a. per-layer weight + per-layer bias draws (shipped round 4;
        107 normal fusions);
     b. per-layer weights, ONE flat draw for all biases;
     c. ONE flat draw for everything, per-layer slice consumers;
2. the ~2.5 ms loop overhead — A/B reduce="mean" (mean accumulated in
   the scan carry; no stacked (S,B,1000) output / reshard) and
   unroll=2 on the presampled body.

Usage: python benchmarks/bench_r05_flagship.py [--mc 10] [--sections 12]
"""

from __future__ import annotations

import argparse
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

sys.path.insert(0, "/root/repo")
from benchmarks._timing import step_time  # noqa: E402

BATCH = 128
IMG = 224


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(kind="bayes"):
    if kind == "det":
        from bayesian_torch_tpu.models.deterministic.resnet_large \
            import resnet50
    else:
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
    model = resnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                   noise=jax.random.key(1, impl="rbg")),
                     data_format="NHWC")
    model.eval()
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    return model


def _iter_entries(model):
    from bayesian_torch_tpu.models.dnn_to_bnn import iter_bayesian_layers
    from bayesian_torch_tpu.ops.sampling import sigma_from_rho

    for layer in iter_bayesian_layers(model):
        is_conv = getattr(layer, "mu_kernel", None) is not None
        is_lin = getattr(layer, "mu_weight", None) is not None
        if not (is_conv or is_lin):
            continue
        mu = layer.mu_kernel[...] if is_conv else layer.mu_weight[...]
        rho = layer.rho_kernel[...] if is_conv else layer.rho_weight[...]
        mu_b = sigma_b = None
        if layer.mu_bias is not None:
            mu_b = layer.mu_bias[...]
            sigma_b = sigma_from_rho(layer.rho_bias[...])
        yield layer, mu, sigma_from_rho(rho), mu_b, sigma_b


def presample_a(model, S):
    """Shipped round-4 layout: one normal per weight + one per bias."""
    outs = []
    for layer, mu, sigma, mu_b, sigma_b in _iter_entries(model):
        eps = jax.random.normal(layer.rngs.noise(), (S,) + mu.shape)
        outs.append(((mu + sigma * eps).astype(jnp.bfloat16)))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append((mu_b + sigma_b * eps_b))
    return outs


def presample_b(model, S):
    """Per-layer weight draws; ONE flat draw for all biases."""
    outs = []
    bias_mu, bias_sigma, key = [], [], None
    for layer, mu, sigma, mu_b, sigma_b in _iter_entries(model):
        eps = jax.random.normal(layer.rngs.noise(), (S,) + mu.shape)
        outs.append(((mu + sigma * eps).astype(jnp.bfloat16)))
        if mu_b is not None:
            bias_mu.append(mu_b)
            bias_sigma.append(sigma_b)
            if key is None:
                key = layer.rngs.noise()
    if bias_mu:
        mu_all = jnp.concatenate(bias_mu)
        sg_all = jnp.concatenate(bias_sigma)
        eps = jax.random.normal(key, (S, mu_all.shape[0]))
        outs.append(mu_all + sg_all * eps)
    return outs


def presample_c(model, S):
    """ONE flat normal for everything; per-layer slice consumers."""
    entries = list(_iter_entries(model))
    sizes = []
    for _, mu, _, mu_b, _ in entries:
        sizes.append(mu.size)
        if mu_b is not None:
            sizes.append(mu_b.size)
    total = sum(sizes)
    key = entries[0][0].rngs.noise()
    eps_all = jax.random.normal(key, (S, total))
    outs, off = [], 0
    for _, mu, sigma, mu_b, sigma_b in entries:
        e = eps_all[:, off:off + mu.size].reshape((S,) + mu.shape)
        off += mu.size
        outs.append((mu + sigma * e).astype(jnp.bfloat16))
        if mu_b is not None:
            e = eps_all[:, off:off + mu_b.size].reshape(
                (S,) + mu_b.shape)
            off += mu_b.size
            outs.append(mu_b + sigma_b * e)
    return outs


def presample_d(model, S):
    """Per-layer draws with sigma MATERIALIZED once (optimization_barrier)
    so softplus(rho) is not recomputed inside every (S, ...) broadcast
    fusion (the profile shows 85% elementwise, ~2.4x the erfinv floor)."""
    entries = list(_iter_entries(model))
    sigmas = jax.lax.optimization_barrier(
        [sg for _, _, sg, _, _ in entries])
    outs = []
    for (layer, mu, _, mu_b, sigma_b), sigma in zip(entries, sigmas):
        eps = jax.random.normal(layer.rngs.noise(), (S,) + mu.shape)
        outs.append(((mu + sigma * eps).astype(jnp.bfloat16)))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append((mu_b + sigma_b * eps_b))
    return outs


def presample_e(model, S):
    """sigma AND mu pre-cast to bf16 + barrier: halves the per-draw
    operand re-read traffic (10 draws re-read each layer's mu+sigma)."""
    entries = list(_iter_entries(model))
    mats = jax.lax.optimization_barrier(
        [t for _, mu, sg, _, _ in entries
         for t in (mu.astype(jnp.bfloat16), sg.astype(jnp.bfloat16))])
    outs = []
    for i, (layer, mu, _, mu_b, sigma_b) in enumerate(entries):
        mu16, sg16 = mats[2 * i], mats[2 * i + 1]
        eps = jax.random.normal(layer.rngs.noise(), (S,) + mu.shape,
                                jnp.bfloat16)
        outs.append(mu16 + sg16 * eps)
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append(mu_b + sigma_b * eps_b)
    return outs


def presample_f(model, S):
    """f32 eps (full-resolution draws, no semantic cost) with mu/sigma
    pre-cast to bf16 + barrier: isolates the operand-traffic factor of
    variant (e) from its bf16-eps generation factor."""
    entries = list(_iter_entries(model))
    mats = jax.lax.optimization_barrier(
        [t for _, mu, sg, _, _ in entries
         for t in (mu.astype(jnp.bfloat16), sg.astype(jnp.bfloat16))])
    outs = []
    for i, (layer, mu, _, mu_b, sigma_b) in enumerate(entries):
        mu16, sg16 = mats[2 * i], mats[2 * i + 1]
        eps = jax.random.normal(layer.rngs.noise(), (S,) + mu.shape)
        outs.append((mu16.astype(jnp.float32)
                     + sg16.astype(jnp.float32) * eps).astype(
                         jnp.bfloat16))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append(mu_b + sigma_b * eps_b)
    return outs


def presample_g(model, S):
    """bf16 eps + f32 mu/sigma (the other half of the (e) split)."""
    outs = []
    for layer, mu, sigma, mu_b, sigma_b in _iter_entries(model):
        eps = jax.random.normal(layer.rngs.noise(), (S,) + mu.shape,
                                jnp.bfloat16).astype(jnp.float32)
        outs.append(((mu + sigma * eps).astype(jnp.bfloat16)))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append(mu_b + sigma_b * eps_b)
    return outs


def presample_h(model, S):
    """f32 eps generated in FLAT (S, n) shape per layer, reshaped to the
    kernel shape afterwards. Theory: the (S, O, I, 1, 1)-shaped
    generation fusions run at terrible VPU lane efficiency (minor dims
    1x1); a flat iteration space restores full lanes, and for 1x1
    kernels the row-major reshape is exactly the conv-preferred
    {I-minor, O} layout."""
    outs = []
    for layer, mu, sigma, mu_b, sigma_b in _iter_entries(model):
        n = mu.size
        eps = jax.random.normal(layer.rngs.noise(), (S, n))
        w = (mu.reshape(-1) + sigma.reshape(-1) * eps).astype(
            jnp.bfloat16)
        outs.append(w.reshape((S,) + mu.shape))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append(mu_b + sigma_b * eps_b)
    return outs


def presample_i(model, S):
    """Counter-hash Box-Muller (ops/sampling.normal_fused): pure
    elementwise iota+mix math, no rng-bit-generator op at all."""
    from bayesian_torch_tpu.ops.sampling import normal_fused

    outs = []
    for layer, mu, sigma, mu_b, sigma_b in _iter_entries(model):
        eps = normal_fused(layer.rngs.noise(), (S,) + mu.shape)
        outs.append(((mu + sigma * eps).astype(jnp.bfloat16)))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append(mu_b + sigma_b * eps_b)
    return outs


def presample_j(model, S):
    """f32 eps with DEGENERATE spatial dims squeezed: 1x1 kernels
    (56% of RN50 params) generate at (S, O, I) instead of
    (S, O, I, 1, 1); the reshape back only re-attaches size-1 dims
    (no data movement)."""
    outs = []
    for layer, mu, sigma, mu_b, sigma_b in _iter_entries(model):
        shp = tuple(d for d in mu.shape if d != 1)
        eps = jax.random.normal(layer.rngs.noise(), (S,) + shp)
        w = (mu.reshape(shp) + sigma.reshape(shp) * eps).astype(
            jnp.bfloat16)
        outs.append(w.reshape((S,) + mu.shape))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append(mu_b + sigma_b * eps_b)
    return outs


def presample_k(model, S):
    """Box-Muller hash + squeezed degenerate dims (the two candidate
    fixes composed)."""
    from bayesian_torch_tpu.ops.sampling import normal_fused

    outs = []
    for layer, mu, sigma, mu_b, sigma_b in _iter_entries(model):
        shp = tuple(d for d in mu.shape if d != 1)
        eps = normal_fused(layer.rngs.noise(), (S,) + shp)
        w = (mu.reshape(shp) + sigma.reshape(shp) * eps).astype(
            jnp.bfloat16)
        outs.append(w.reshape((S,) + mu.shape))
        if mu_b is not None:
            eps_b = jax.random.normal(layer.rngs.noise(),
                                      (S,) + mu_b.shape)
            outs.append(mu_b + sigma_b * eps_b)
    return outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mc", type=int, default=10)
    p.add_argument("--sections", default="12")
    args = p.parse_args()
    S = args.mc
    x = jax.random.normal(jax.random.key(42), (BATCH, IMG, IMG, 3),
                          jnp.float32)

    bay = build()
    gd, st = nnx.split(bay)

    if "1" in args.sections:
        # ---- section 1: isolated presample step cost, 3 layouts ----
        for name, fn in (("a per-layer w+b (shipped)", presample_a),
                         ("b flat-bias", presample_b),
                         ("c one-flat-draw", presample_c),
                         ("d sigma-barrier", presample_d),
                         ("e bf16-operands", presample_e),
                         ("f f32-eps/bf16-ops", presample_f),
                         ("g bf16-eps/f32-ops", presample_g),
                         ("h flat-shape-eps", presample_h),
                         ("i box-muller-hash", presample_i),
                         ("j squeeze-1x1", presample_j),
                         ("k hash+squeeze", presample_k)):
            @jax.jit
            def run(st, fn=fn):
                model = nnx.merge(gd, st)
                outs = fn(model, S)
                return sum(o.astype(jnp.float32).sum() for o in outs)

            t = step_time(run, st)
            log(f"presample[{name}] MC{S}: {t * 1e3:.2f} ms")

    if "2" in args.sections:
        # ---- section 2: full flagship A/Bs ----
        from bayesian_torch_tpu.parallel import mc_forward

        def flag(tag, **kw):
            @jax.jit
            def fwd(st, x):
                model = nnx.merge(gd, st)
                out = mc_forward(model, x, S, return_kl=False,
                                 emission="scan", **kw)
                return out.astype(jnp.float32).mean()

            t = step_time(fwd, st, x)
            log(f"flagship scan {tag}: {t * 1e3:.2f} ms "
                f"({S * BATCH / t:.1f} imgs/s)")
            return t

        flag("presampled-xla stacked (r4 shipped)")
        flag("presampled-xla reduce=mean", reduce="mean")
        flag("presampled-PALLAS (K1 batch sampler)", presample="on")
        flag("presampled-PALLAS reduce=mean", presample="on",
             reduce="mean")

        # det bs128 denominator for the run-local ratio
        det = build("det")
        gdd, std = nnx.split(det)

        @jax.jit
        def det_fwd(st, x):
            return nnx.merge(gdd, st)(x).astype(jnp.float32).mean()

        t_det = step_time(det_fwd, std, x)
        log(f"det bs{BATCH}: {t_det * 1e3:.2f} ms "
            f"(10x = {10 * t_det * 1e3:.1f} ms)")


def profile_section(which, S=10):
    """Per-fusion profile: 'presample' isolates the draw step;
    'flagship' profiles the full presampled-scan step."""
    from collections import Counter

    from bayesian_torch_tpu.utils.profiling import summarize_trace, trace

    bay = build()
    gd, st = nnx.split(bay)
    x = jax.random.normal(jax.random.key(42), (BATCH, IMG, IMG, 3),
                          jnp.float32)

    if which == "presample":
        @jax.jit
        def fn(st):
            model = nnx.merge(gd, st)
            outs = presample_a(model, S)
            return sum(o.astype(jnp.float32).sum() for o in outs)

        args = (st,)
    else:
        from bayesian_torch_tpu.parallel import mc_forward

        @jax.jit
        def fn(st, x):
            model = nnx.merge(gd, st)
            return mc_forward(model, x, S, return_kl=False,
                              emission="scan").astype(jnp.float32).mean()

        args = (st, x)

    t = step_time(fn, *args)
    logdir = f"/tmp/trace_r05f_{which}"
    steps = 2
    with trace(logdir):
        for _ in range(steps):
            r = fn(*args)
        float(r)
    rows = summarize_trace(logdir, top=4000)
    total = sum(ms for _, ms in rows) / steps
    print(f"\n== {which}: step {t * 1e3:.2f} ms (slope), device-op sum "
          f"{total:.2f} ms/step ==", flush=True)
    buckets = Counter()
    for name, ms in rows:
        n = name.lower()
        if "convolution" in n:
            b = "conv"
        elif "rng" in n:
            b = "rng"
        elif "erf" in n or "sample" in n:
            b = "sample-math"
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            b = "copy/layout"
        elif "dynamic" in n:
            b = "loop slice/stack"
        elif "reduce" in n:
            b = "reduce"
        elif "fusion" in n:
            b = "elementwise"
        else:
            b = "other"
        buckets[b] += ms / steps
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, ms in rows[:35]:
        per = ms / steps
        print(f"{per:9.3f}  {100 * per / total:5.1f}  {name[:100]}")
    print("-- buckets --")
    for b, ms in buckets.most_common():
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {b}")


if __name__ == "__main__":
    if "profile_presample" in sys.argv:
        profile_section("presample")
    elif "profile_flagship" in sys.argv:
        profile_section("flagship")
    else:
        main()
