"""K1 sampled-GEMM: Pallas fused sample-then-matmul vs the XLA
materialize-W path.

Measured outcome (round 2, v5e): the Pallas kernel loses ~2x at EVERY
shape below (e.g. 32x4096x4096: 0.64 vs 0.31 ms) — rbg-keyed XLA
sampling fuses into the GEMM operand materialization and the Mosaic
matmul mainloop runs at ~45-100 TOPS vs XLA's ~340 (ROADMAP.md). This
bench exists to keep that comparison reproducible as toolchains move.

Prints one JSON line per (shape, impl). Run on the TPU.
"""

import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402

from benchmarks._timing import step_time  # noqa: E402

SHAPES = [
    # (batch, in_features, out_features)
    (32, 4096, 4096),
    (8, 8192, 8192),
    (256, 1024, 4096),   # LSTM-ish gate block
]


def main():
    from bayesian_torch_tpu.ops.pallas.sampled_matmul import (
        sampled_matmul_pallas,
    )
    from bayesian_torch_tpu.ops.sampling import sample_gaussian_weight

    for (b, k, n) in SHAPES:
        key = jax.random.key(3, impl="rbg")
        x = jax.random.normal(jax.random.key(0), (b, k), jnp.float32)
        mu = jax.random.normal(jax.random.key(1), (n, k),
                               jnp.float32) * 0.05
        rho = jnp.full((n, k), -3.0, jnp.float32)

        @jax.jit
        def f_xla(x, mu, rho, key):
            w, _ = sample_gaussian_weight(key, mu, rho)
            return (x @ w.T).mean()

        @jax.jit
        def f_pallas(x, mu, rho, key):
            return sampled_matmul_pallas(key, x, mu, rho).mean()

        for name, f in (("xla", f_xla), ("pallas", f_pallas)):
            t = step_time(f, x, mu, rho, key)
            print(json.dumps({
                "metric": f"sampled_gemm_{b}x{k}x{n}_{name}",
                "ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
