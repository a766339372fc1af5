"""Decompose the scan emission's residual vs the det bound (round 4).

Round-4 discovery: the det RN50 forward is FASTER per image at bs128
(9.81 ms, 13,042 imgs/s) than at bs1280 (109.91 ms, 11,646 imgs/s) —
the "perfectly batched" bs1280 denominator used since round 1 is NOT
the tightest honest bound. Ten sequential bs128 det forwards cost
98.1 ms, so the scan emission's 113.07 ms has a real ~15 ms residual
(per draw: ~0.74 ms weight sampling + weight-materialization breakage
of det-form fusions + loop overhead).

This bench separates those terms:

1. det-under-scan: the det model run 10x under the same lax.scan
   harness -> loop/stacking overhead alone (the honest equal-structure
   denominator for the scan emission).
2. scan with in-body sampling (the shipped emission).
3. scan over PRESAMPLED draws: all (S, ...) weights drawn outside the
   loop with plain XLA rbg normals behind an optimization_barrier
   (parallel.mc._presample_layers_xla), the scan body consuming
   Presampled axis 0 per iteration -> a pure det-form body; isolates
   what in-body sampling costs beyond the draw FLOPs.

Usage: python benchmarks/bench_scan_presample.py [--mc 10]
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


def build(kind):
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mc", type=int, default=10)
    args = p.parse_args()
    S = args.mc
    x = jax.random.normal(jax.random.key(42), (BATCH, IMG, IMG, 3),
                          jnp.float32)

    # 1. det model under the same scan harness (loop-overhead bound)
    det = build("det")
    gd_d, st_d = nnx.split(det)

    @jax.jit
    def det_scan(st, x):
        model = nnx.merge(gd_d, st)

        def body(c, _):
            return c, model(c)

        _, outs = jax.lax.scan(body, x, None, length=S)
        return outs.mean()

    t = step_time(det_scan, st_d, x)
    log(f"det-under-scan x{S} bs{BATCH}: {t * 1e3:.2f} ms "
        f"({S * BATCH / t:.1f} imgs/s)")

    # 2. shipped scan emission (in-body sampling)
    from bayesian_torch_tpu.parallel import mc_forward

    bay = build("bayes")
    gd_b, st_b = nnx.split(bay)

    @jax.jit
    def scan_fwd(st, x):
        model = nnx.merge(gd_b, st)
        return mc_forward(model, x, S, return_kl=False,
                          emission="scan").mean()

    t = step_time(scan_fwd, st_b, x)
    log(f"scan in-body sampling MC{S}: {t * 1e3:.2f} ms "
        f"({S * BATCH / t:.1f} imgs/s)")

    # 3. scan over presampled (S, ...) draws — pure det-form body
    from bayesian_torch_tpu.layers.base_variational_layer import Presampled
    from bayesian_torch_tpu.parallel.mc import _presample_layers_xla

    @jax.jit
    def scan_presampled(st, x):
        model = nnx.merge(gd_b, st)
        touched = _presample_layers_xla(model, S)
        state_axes = nnx.StateAxes({"noise": 0, Presampled: 0, ...: None})

        def body(model, x):
            out = model(x)
            out = out[0] if isinstance(out, tuple) else out
            return x, out

        run = nnx.split_rngs(splits=S, only="noise")(
            nnx.scan(body, in_axes=(state_axes, nnx.Carry),
                     out_axes=(nnx.Carry, 0)))
        try:
            _, outs = run(model, x)
        finally:
            for layer, attrs in touched:
                for a in attrs:
                    delattr(layer, a)
        return outs.mean()

    t = step_time(scan_presampled, st_b, x)
    log(f"scan presampled-draws MC{S}: {t * 1e3:.2f} ms "
        f"({S * BATCH / t:.1f} imgs/s)")


if __name__ == "__main__":
    main()
