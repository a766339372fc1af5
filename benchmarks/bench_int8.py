"""INT8 QBNN ResNet-50 MC-1 inference vs the bf16 Bayesian float path.

VERDICT K4 target: >= 1.5x over bf16 (round 1 was 1.10x with the
full-width ones-conv zero-point correction; the correction is now a
single-channel conv).

Prints JSON lines with both throughputs and the ratio.
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


def main():
    from bayesian_torch_tpu.models.bayesian.quantized_resnet_variational_large import (  # noqa: E501
        qresnet50,
    )
    from bayesian_torch_tpu.models.bayesian.resnet_variational_large import (
        resnet50 as bayes_resnet50,
    )

    x = jax.random.normal(jax.random.key(7), (BATCH, 3, IMG, IMG),
                          jnp.float32)

    # --- bf16 float Bayesian MC-1 ---------------------------------------
    bayes = bayes_resnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                         noise=jax.random.key(1,
                                                              impl="rbg")))
    bayes.eval()
    _set_compute_dtype(bayes, jnp.bfloat16)
    gd, st = nnx.split(bayes)

    @jax.jit
    def f_fwd(st, x):
        m = nnx.merge(gd, st)
        out, _ = m(x)
        return out.mean()

    t_f = step_time(f_fwd, st, x)

    # --- INT8 QBNN MC-1 ---------------------------------------------------
    q = qresnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                noise=jax.random.key(1, impl="rbg")),
                  fuse_conv_bn=True)
    qgd, qst = nnx.split(q)

    @jax.jit
    def q_fwd(st, x):
        m = nnx.merge(qgd, st)
        out, _ = m(x)
        return out.mean()

    t_q = step_time(q_fwd, qst, x)

    print(json.dumps({"metric": "int8_qbnn_resnet50_mc1",
                      "value": round(BATCH / t_q, 1),
                      "unit": "imgs/sec/chip",
                      "ms_per_step": round(t_q * 1e3, 2)}))
    print(json.dumps({"metric": "bf16_bayes_resnet50_mc1",
                      "value": round(BATCH / t_f, 1),
                      "unit": "imgs/sec/chip",
                      "ms_per_step": round(t_f * 1e3, 2)}))
    print(json.dumps({"metric": "int8_over_bf16",
                      "value": round(t_f / t_q, 3), "unit": "x"}))


if __name__ == "__main__":
    main()
