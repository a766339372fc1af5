"""Scan-over-draws emission for the flagship MC forward (round 4).

doc/PROFILE_r04.md's corrected attribution of the 0.82 residual: the
vmapped MC-10 flagship pays (i) post-barrier weight relayout fusions
(a (10,1024,512,1,1) kernel relayout runs at ~23 GB/s) and (ii) a
spread across the 5-D conv fusions themselves (vmap emitter tiling),
NOT a raw conv form tax (bench_1x1_mc.py) and NOT the sampling FLOPs.

A ``lax.scan`` over the draw axis removes both by construction: each
iteration runs the plain 4-D det-form model forward with that draw's
noise stream — identical HLO shape to the deterministic denominator —
and the per-draw weights are built inside the body (1/10 the relayout
footprint, same fusion forms XLA picks for the det model).

The trade: the loop serializes draws (fine — the chip is 100% busy in
the vmapped form already, doc/PROFILE_r03.md) and stacks outputs via
dynamic-update-slice.

Usage:  python benchmarks/bench_scan_mc.py [--model resnet50] [--mc 10]
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(name, data_format="NHWC", kind="bayes"):
    if kind == "det":
        import bayesian_torch_tpu.models.deterministic.resnet_large as zoo
    else:
        import bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            as zoo
    model = getattr(zoo, name)(
        rngs=nnx.Rngs(params=jax.random.key(0),
                      noise=jax.random.key(1, impl="rbg")),
        data_format=data_format)
    model.eval()
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--mc", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--skip-vmap", action="store_true")
    args = ap.parse_args()

    from bayesian_torch_tpu.parallel import mc_forward

    x = jax.random.normal(jax.random.key(42),
                          (args.batch, 224, 224, 3), jnp.float32)

    model = build(args.model)
    graphdef, state = nnx.split(model)

    if not args.skip_vmap:
        @jax.jit
        def fwd_vmap(state, x):
            m = nnx.merge(graphdef, state)
            return mc_forward(m, x, args.mc, return_kl=False).mean()

        t = step_time(fwd_vmap, state, x)
        log(f"vmap     mc{args.mc} bs{args.batch}: {t*1e3:8.2f} ms "
            f"({args.batch/t:7.1f} imgs/s)")

    @jax.jit
    def fwd_scan(state, x):
        m = nnx.merge(graphdef, state)
        return mc_forward(m, x, args.mc, return_kl=False,
                          emission="scan").mean()

    t = step_time(fwd_scan, state, x)
    log(f"scan     mc{args.mc} bs{args.batch}: {t*1e3:8.2f} ms "
        f"({args.batch/t:7.1f} imgs/s)")

    # deterministic reference points at bs and 10x bs
    det = build(args.model, kind="det")
    dgd, dst = nnx.split(det)

    @jax.jit
    def det_fwd(state, x):
        return nnx.merge(dgd, state)(x).mean()

    xb = jax.random.normal(jax.random.key(43),
                           (args.batch * args.mc, 224, 224, 3),
                           jnp.float32)
    t = step_time(det_fwd, dst, xb)
    log(f"det      bs{args.batch*args.mc}:     {t*1e3:8.2f} ms "
        f"({args.batch*args.mc/t:7.1f} imgs/s)")
    t = step_time(det_fwd, dst, x)
    log(f"det      bs{args.batch}:      {t*1e3:8.2f} ms x{args.mc} = "
        f"{t*1e3*args.mc:8.2f} ms")


if __name__ == "__main__":
    main()
