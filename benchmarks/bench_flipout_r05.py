"""Flipout scan-emission A/Bs (VERDICT r4 #2, round 5).

The HLO attribution (analyze_flipout_hlo.py) shows the scanned flipout
body's sign multiplies FUSE into the conv fusions (each big fusion =
1 convolution + 8-12 multiplies + adds/selects/max) — there is no
separate sign pass to eliminate. The remaining structural lever is the
dual-conv emission: mode="fused" computes the mean and perturbation
halves in ONE feature_group_count=2 conv over concat([x, x*s_in])
(halves the weight-read trips, doubles nothing), which lost badly
under vmap (560 ms) but was never tried under the det-form scan body.

Usage: python benchmarks/bench_flipout_r05.py [--mc 10]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mc", type=int, default=10)
    args = p.parse_args()
    S = args.mc

    from bayesian_torch_tpu.models.bayesian.resnet_flipout_large \
        import resnet50
    from bayesian_torch_tpu.ops import conv as conv_ops
    from bayesian_torch_tpu.parallel import mc_forward

    model = resnet50(rngs=nnx.Rngs(
        params=jax.random.key(0),
        noise=jax.random.key(1, impl="rbg")), data_format="NHWC")
    model.eval()
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    gd, st = nnx.split(model)
    x = jax.random.normal(jax.random.key(42), (BATCH, IMG, IMG, 3),
                          jnp.float32)

    for mode in ("two", "fused"):
        old = conv_ops.FLIPOUT_CONV_MODE
        conv_ops.FLIPOUT_CONV_MODE = mode
        try:
            @jax.jit
            def fwd(st, x, mode=mode):
                m = nnx.merge(gd, st)
                return mc_forward(m, x, S, return_kl=False,
                                  emission="scan").astype(
                                      jnp.float32).mean()

            t = step_time(fwd, st, x)
            log(f"flipout scan mode={mode}: {t * 1e3:.2f} ms "
                f"({BATCH / t:.1f} imgs/s)")
        finally:
            conv_ops.FLIPOUT_CONV_MODE = old

    # reduce=mean on the best mode (free win on reparam; check here)
    @jax.jit
    def fwd_rm(st, x):
        m = nnx.merge(gd, st)
        return mc_forward(m, x, S, return_kl=False, emission="scan",
                          reduce="mean").astype(jnp.float32).mean()

    t = step_time(fwd_rm, st, x)
    log(f"flipout scan reduce=mean: {t * 1e3:.2f} ms "
        f"({BATCH / t:.1f} imgs/s)")


if __name__ == "__main__":
    main()
