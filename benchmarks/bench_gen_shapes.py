"""Isolate the f32-erfinv generation-shape pathology (round 5).

The full presample costs 13 ms f32 / 3.5 ms bf16 for 255M draws, but
bench_normal_gen.py measured 4.56 / 3.48 on one flat buffer. Measure
mu + sigma*eps -> bf16 for ONE RN50-like kernel shape at MC-10, f32 vs
bf16 eps, shaped vs flat, rbg key, to find which factor triggers the
3x f32 slowdown.

Usage: python benchmarks/bench_gen_shapes.py
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from benchmarks._timing import step_time  # noqa: E402

S = 10


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    key = jax.random.key(1, impl="rbg")
    # (O, I, kh, kw) shapes: a 1x1 site, a 3x3 site, and flat twins
    shapes = [
        ("1x1 (1024,512,1,1)", (1024, 512, 1, 1)),
        ("3x3 (512,512,3,3)", (512, 512, 3, 3)),
        ("flat 524288", (524288,)),
        ("flat 2359296", (2359296,)),
    ]
    for name, shp in shapes:
        mu = jax.random.normal(jax.random.key(0), shp, jnp.float32)
        sigma = jnp.abs(mu) * 0.1
        n = mu.size
        for dtype in (jnp.float32, jnp.bfloat16):
            @jax.jit
            def gen(key, mu, sigma, dtype=dtype, shp=shp):
                eps = jax.random.normal(key, (S,) + shp, dtype)
                w = (mu.astype(dtype) + sigma.astype(dtype) * eps)
                return w.astype(jnp.float32).sum()

            t = step_time(gen, key, mu, sigma)
            gbps = S * n * 4 / t / 1e9
            log(f"{name} eps={jnp.dtype(dtype).name}: {t * 1e3:.3f} ms "
                f"({S * n / t / 1e9:.2f} Gdraw/s)")

        # raw normal only (no mu/sigma algebra), f32
        @jax.jit
        def gen_raw(key, shp=shp):
            return jax.random.normal(key, (S,) + shp,
                                     jnp.float32).sum()

        t = step_time(gen_raw, key)
        log(f"{name} raw-normal f32: {t * 1e3:.3f} ms")

        # erfinv alone on an existing uniform (separates generation
        # from the transcendental)
        u = jax.random.uniform(jax.random.key(2), (S,) + shp,
                               jnp.float32, -1.0, 1.0)

        @jax.jit
        def erf_only(u):
            return jax.lax.erf_inv(u).sum()

        t = step_time(erf_only, u)
        log(f"{name} erfinv-only f32: {t * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
