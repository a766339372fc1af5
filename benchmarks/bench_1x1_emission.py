"""A/B the emission of per-draw-weight 1x1 convs under the MC vmap.

The flagship profile (doc/PROFILE_r03.md) attributes the bayes-vs-det
SoL gap (39.5% vs 44.4%) to XLA's grouped/5-D conv forms for vmapped
per-draw weights. RN50's 1x1 convs are ~37% of its FLOPs and are
mathematically plain GEMMs — so they can also be emitted as a *batched
dot* ((S, B*H*W, C) x (S, C, O)), which XLA maps to its batched-GEMM
tiling instead of the conv form. This measures whether that emission is
faster at the RN50 bottleneck shapes, with BOTH operands carrying the
draw axis (the post-stem case in the flagship).

Emissions per shape (B=128, S=10, bf16, NHWC):
  conv    vmap over draws of lax.conv_general_dilated (current path)
  einsum  vmap over draws of (B*H*W, C) @ (C, O)  [stride-2 = slice first]
  det     unbatched conv at batch S*B, one weight (equal-work det bound)

Usage: PYTHONPATH=/root/repo python benchmarks/bench_1x1_emission.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bayesian_torch_tpu.ops.conv import conv_nd  # noqa: E402
from benchmarks._timing import step_time  # noqa: E402

B, S = 128, 10
DT = jnp.bfloat16

# RN50 1x1 conv shapes: (H, Cin, Cout, stride)
SHAPES = [
    (56, 64, 64, 1), (56, 64, 256, 1), (56, 256, 64, 1),
    (28, 256, 128, 1), (28, 128, 512, 1), (28, 512, 128, 1),
    (14, 512, 256, 1), (14, 256, 1024, 1), (14, 1024, 256, 1),
    (7, 1024, 512, 1), (7, 512, 2048, 1), (7, 2048, 512, 1),
    (56, 256, 512, 2), (28, 512, 1024, 2), (14, 1024, 2048, 2),
]


def main():
    key = jax.random.key(0)
    print(f"device={jax.devices()[0].platform} B={B} S={S} dtype=bf16")
    print(f"{'shape':>24} {'conv':>9} {'einsum':>9} {'det':>9} "
          f"{'einsum/conv':>11}")
    tot = {"conv": 0.0, "einsum": 0.0, "det": 0.0}
    for (h, cin, cout, s) in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, h * cin + cout))
        xs = jax.random.normal(kx, (S, B, h, h, cin), DT)
        ws = jax.random.normal(kw, (S, cout, cin, 1, 1), DT)
        xd = jax.random.normal(kx, (S * B, h, h, cin), DT)

        @jax.jit
        def f_conv(xs, ws):
            y = jax.vmap(lambda x, w: conv_nd(
                x, w, stride=s, compute_dtype=DT,
                data_format="NHWC"))(xs, ws)
            return y.sum()

        @jax.jit
        def f_einsum(xs, ws):
            z = xs[:, :, ::s, ::s, :] if s > 1 else xs
            w2 = ws[:, :, :, 0, 0]  # (S, O, I)
            y = jax.vmap(lambda x, w: jnp.einsum(
                "bhwc,oc->bhwo", x, w,
                preferred_element_type=DT))(z, w2)
            return y.sum()

        @jax.jit
        def f_det(xd, w):
            y = conv_nd(xd, w[0], stride=s, compute_dtype=DT,
                        data_format="NHWC")
            return y.sum()

        tc = step_time(f_conv, xs, ws) * 1e3
        te = step_time(f_einsum, xs, ws) * 1e3
        td = step_time(f_det, xd, ws) * 1e3
        tot["conv"] += tc
        tot["einsum"] += te
        tot["det"] += td
        print(f"{(h, cin, cout, s)!s:>24} {tc:9.3f} {te:9.3f} {td:9.3f} "
              f"{te / tc:11.2f}")
    print(f"{'TOTAL':>24} {tot['conv']:9.3f} {tot['einsum']:9.3f} "
          f"{tot['det']:9.3f} {tot['einsum'] / tot['conv']:11.2f}")


if __name__ == "__main__":
    main()
