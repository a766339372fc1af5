"""Normal-draw generation strategies for the presampled scan (round 4).

The presampled scan's residual over the 10x-det floor is ~7.4 ms of
weight sampling (10 x 25.5M draws) + ~2.5 ms loop overhead. XLA's
``jax.random.normal`` computes erfinv(2u-1)*sqrt(2) per element; a
Box-Muller pair (one log+sqrt+sincos per TWO draws) may be cheaper on
the VPU. This microbench times the candidates at flagship scale with
rbg keys (the recommended default).

Each candidate draws N normals, scales them mu+sigma*eps style, casts
to bf16 and reduces (so nothing is DCE'd and the fusion shape matches
the presample path).

Usage: python benchmarks/bench_normal_gen.py [--n 255000000]
"""

from __future__ import annotations

import argparse
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from benchmarks._timing import step_time  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=255_000_000)
    args = p.parse_args()
    N = args.n
    key = jax.random.key(1, impl="rbg")
    mu = jnp.float32(0.01)
    sigma = jnp.float32(0.1)

    @jax.jit
    def xla_normal(key):
        eps = jax.random.normal(key, (N,))
        return ((mu + sigma * eps).astype(jnp.bfloat16)
                .sum(dtype=jnp.float32))

    @jax.jit
    def box_muller(key):
        k1, k2 = jax.random.split(key)
        h = N // 2
        # uniforms in (0, 1]: 1 - uniform[0,1) avoids log(0)
        u1 = 1.0 - jax.random.uniform(k1, (h,))
        u2 = jax.random.uniform(k2, (h,))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        th = (2.0 * jnp.pi) * u2
        z = jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)])
        return ((mu + sigma * z).astype(jnp.bfloat16)
                .sum(dtype=jnp.float32))

    @jax.jit
    def xla_normal_bf16(key):
        eps = jax.random.normal(key, (N,), jnp.bfloat16)
        return (mu.astype(jnp.bfloat16) + sigma.astype(jnp.bfloat16)
                * eps).sum(dtype=jnp.float32)

    @jax.jit
    def bits_only(key):
        # floor: raw bit generation + the same elementwise epilogue
        bits = jax.random.bits(key, (N,), jnp.uint32)
        z = (bits >> 9).astype(jnp.float32) * (1.0 / (1 << 23))
        return ((mu + sigma * z).astype(jnp.bfloat16)
                .sum(dtype=jnp.float32))

    for name, fn in (("xla_normal_f32", xla_normal),
                     ("box_muller_f32", box_muller),
                     ("xla_normal_bf16", xla_normal_bf16),
                     ("bits_floor", bits_only)):
        t = step_time(fn, key)
        log(f"{name}: {t * 1e3:.2f} ms ({N / t / 1e9:.1f} Gdraws/s)")


if __name__ == "__main__":
    main()
