"""Raw Mosaic matmul mainloop ceiling — the round-2/4 re-measurement.

Round-2 measurements put the Mosaic (Pallas) matmul mainloop at
~45-100 TOPS on v5e for both bf16 and s8, while XLA's own dot reaches
~340 TOPS int8 / ~150+ bf16 — that ceiling is what shelved every
hand-written GEMM/conv kernel (ROADMAP.md). CLAUDE.md's standing rule:
don't re-litigate Pallas kernels *without re-measuring this number* on
the current toolchain. This bench is that re-measurement: a plain
blocked Pallas matmul (no sampling, no epilogue — just the MXU
mainloop) across block configs, against `jnp.dot` at the same shapes.

If the best Pallas config ever reaches ~0.8x of the XLA dot, the
grouped-conv / sampled-GEMM kernels become worth re-opening.

Run on the TPU: PYTHONPATH=/root/repo:$PYTHONPATH python
benchmarks/bench_mosaic_matmul.py. Prints one JSON line per config.
"""

import functools
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from benchmarks._timing import step_time  # noqa: E402


def _mm_kernel(x_ref, y_ref, o_ref, acc_ref, *, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], y_ref[...],
                            preferred_element_type=acc_ref.dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def pallas_matmul(x, y, bm, bn, bk, acc_dtype=jnp.float32):
    m, k = x.shape
    k2, n = y.shape
    assert k == k2 and m % bm == 0 and n % bn == 0 and k % bk == 0
    out_dtype = x.dtype if x.dtype != jnp.int8 else jnp.int32
    if x.dtype == jnp.int8:
        acc_dtype = jnp.int32
    return pl.pallas_call(
        functools.partial(_mm_kernel, out_dtype=out_dtype),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, y)


SHAPES = [(4096, 4096, 4096), (8192, 4096, 4096)]
BLOCKS = [(512, 512, 512), (512, 1024, 512), (1024, 1024, 512),
          (256, 1024, 1024), (512, 512, 1024), (256, 512, 2048)]


def run(dtype_name):
    dtype = {"bf16": jnp.bfloat16, "s8": jnp.int8}[dtype_name]
    for (m, n, k) in SHAPES:
        kx, ky = jax.random.split(jax.random.key(0))
        if dtype == jnp.int8:
            x = jax.random.randint(kx, (m, k), -127, 127, jnp.int8)
            y = jax.random.randint(ky, (k, n), -127, 127, jnp.int8)
        else:
            x = jax.random.normal(kx, (m, k), dtype)
            y = jax.random.normal(ky, (k, n), dtype)
        tops = 2 * m * n * k / 1e12

        @jax.jit
        def f_xla(x, y):
            pt = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
            return jnp.dot(x, y, preferred_element_type=pt).sum()

        t = step_time(f_xla, x, y)
        print(json.dumps({"metric": f"xla_dot_{dtype_name}_{m}x{n}x{k}",
                          "ms": round(t * 1e3, 3),
                          "tops": round(tops / t, 1)}), flush=True)

        best = None
        for (bm, bn, bk) in BLOCKS:
            if m % bm or n % bn or k % bk:
                continue
            # VMEM: x block + y block + out block + acc (guard 128 MiB)
            vmem = (bm * bk + bk * bn) * x.dtype.itemsize \
                + bm * bn * (4 + x.dtype.itemsize)
            if 3 * vmem > 100 * 2**20:
                continue

            @jax.jit
            def f_pl(x, y, bm=bm, bn=bn, bk=bk):
                return pallas_matmul(x, y, bm, bn, bk).sum()

            try:
                t = step_time(f_pl, x, y)
            except Exception as e:  # noqa: BLE001 — record and move on
                print(json.dumps({
                    "metric": f"pallas_{dtype_name}_{m}x{n}x{k}"
                              f"_b{bm}x{bn}x{bk}",
                    "error": str(e)[:120]}), flush=True)
                continue
            rec = {"metric": f"pallas_{dtype_name}_{m}x{n}x{k}"
                             f"_b{bm}x{bn}x{bk}",
                   "ms": round(t * 1e3, 3),
                   "tops": round(tops / t, 1)}
            print(json.dumps(rec), flush=True)
            if best is None or rec["tops"] > best["tops"]:
                best = rec
        if best:
            print(json.dumps({"metric": f"BEST_pallas_{dtype_name}"
                                        f"_{m}x{n}x{k}", **best}),
                  flush=True)


if __name__ == "__main__":
    import sys

    for d in (sys.argv[1:] or ["bf16", "s8"]):
        run(d)
