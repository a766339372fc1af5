"""INT8 QBNN ResNet-50 MC-1 inference vs the bf16 Bayesian float path.

VERDICT K4 target: >= 1.5x over bf16. Round-1 was 1.10x (full-width
ones-conv zero-point correction, fp32 activations between layers).
Round-2 levers: single-channel correction conv, fused Pallas
GEMM+requant for 1x1 NHWC convs, and the QTensor uint8 activation flow
(quantize_activations=True — no fp32 round trips between convs).

Measures both layouts; the headline int8/bf16 ratio compares the best
of each. Prints JSON lines.
"""

import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from benchmarks._timing import step_time  # noqa: E402

BATCH = 32
IMG = 224


def _set_compute_dtype(model, dtype):
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = dtype


def _input(df):
    shape = ((BATCH, 3, IMG, IMG) if df == "NCHW"
             else (BATCH, IMG, IMG, 3))
    return jax.random.normal(jax.random.key(7), shape, jnp.float32)


def main():
    from bayesian_torch_tpu.models.bayesian.quantized_resnet_variational_large import (  # noqa: E501
        qresnet50,
    )
    from bayesian_torch_tpu.models.bayesian.resnet_variational_large import (
        resnet50 as bayes_resnet50,
    )

    results = {}
    for df in ("NCHW", "NHWC"):
        x = _input(df)

        # --- bf16 float Bayesian MC-1 ---------------------------------
        bayes = bayes_resnet50(
            rngs=nnx.Rngs(params=jax.random.key(0),
                          noise=jax.random.key(1, impl="rbg")),
            data_format=df)
        bayes.eval()
        _set_compute_dtype(bayes, jnp.bfloat16)
        gd, st = nnx.split(bayes)

        @jax.jit
        def f_fwd(st, x, gd=gd):
            m = nnx.merge(gd, st)
            out, _ = m(x)
            return out.mean()

        results[("bf16", df)] = step_time(f_fwd, st, x)

        # --- INT8 QBNN MC-1 -------------------------------------------
        q = qresnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                    noise=jax.random.key(1, impl="rbg")),
                      fuse_conv_bn=True, data_format=df)
        qgd, qst = nnx.split(q)

        @jax.jit
        def q_fwd(st, x, qgd=qgd):
            m = nnx.merge(qgd, st)
            out, _ = m(x)
            return out.mean()

        results[("int8", df)] = step_time(q_fwd, qst, x)

    for (kind, df), t in results.items():
        print(json.dumps({"metric": f"{kind}_bayes_resnet50_mc1_{df}",
                          "value": round(BATCH / t, 1),
                          "unit": "imgs/sec/chip",
                          "ms_per_step": round(t * 1e3, 2)}))
    t_q = min(results[("int8", "NCHW")], results[("int8", "NHWC")])
    t_f = min(results[("bf16", "NCHW")], results[("bf16", "NHWC")])
    print(json.dumps({"metric": "int8_over_bf16",
                      "value": round(t_f / t_q, 3), "unit": "x"}))


if __name__ == "__main__":
    main()
