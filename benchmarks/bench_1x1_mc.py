"""Per-draw 1x1-conv emissions under the MC axis — the hybrid lever.

The flagship's residual vs the 10x-det bound is XLA's grouped-conv form
tax, worst at 1x1 stride-1 sites (0.07 SoL raw, doc/PROFILE_r03.md).
VERDICT r3 asks for a *hybrid* attempt: replace only those sites inside
the otherwise-vmapped model. This bench measures the candidate
emissions RAW at every 1x1 s1 RN50 site (S=10 draws, bs=128, bf16),
activations in the vmapped path's (B, sp, sp, S, C) layout:

- vmap5d: what the model emits today — jax.vmap of the unbatched conv
  over (x draw axis 3, w draw axis 0)
- grouped: fg=S grouped conv on the reshaped (B,sp,sp,S*C) fast form
  (the structured-MC emission, here per-site)
- dot: XLA dot_general with S as a batch dim (no reshape)
- pallas: per-draw blocked GEMM kernel (grid (S, M, O, C) with the
  draw dim squeezed from block views) — viable again now that the
  Mosaic matmul mainloop reaches XLA-dot speed
  (benchmarks/bench_mosaic_matmul.py, round 4).

Run on the TPU. Prints a table + one JSON summary line.
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

BATCH = 128
S = 10

# 1x1 stride-1 sites from profile_flagship.RN50_CONVS: (ci, co, sp, count)
SITES = [
    (64, 64, 56, 1), (64, 256, 56, 4), (256, 64, 56, 2),
    (256, 128, 56, 1),
    (128, 512, 28, 4), (512, 128, 28, 3),
    (512, 256, 28, 1), (256, 1024, 14, 6), (1024, 256, 14, 5),
    (1024, 512, 14, 1), (512, 2048, 7, 3), (2048, 512, 7, 2),
]

DN = ("NHWC", "HWIO", "NHWC")


def _gemm_kernel(x_ref, w_ref, o_ref, acc_ref, *, ns):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for s in range(ns):  # unrolled per-draw MXU dots
        acc_ref[:, s, :] += jnp.dot(x_ref[:, s, :], w_ref[s],
                                    preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_bm(m, cap):
    for bm in (512, 448, 256, 128, 64, 32, 16, 8):
        if bm <= cap and m % bm == 0:
            return bm
    return m


def pallas_mc_gemm(x, w, bm, bo, bk):
    """x (M, S, C), w (S, C, O) -> out (M, S, O); per-draw GEMM. The
    draw dim rides whole inside each block (a squeezed/blocked middle
    dim violates the Mosaic (8,128) tiling rule), and the kernel loops
    the S dots — each a plain 2-D MXU tile."""
    m, s, c = x.shape
    s2, c2, o = w.shape
    assert s == s2 and c == c2
    bm = _pick_bm(m, bm)
    bo = min(bo, o)
    bk = min(bk, c)
    assert m % bm == 0 and o % bo == 0 and c % bk == 0
    return pl.pallas_call(
        functools.partial(_gemm_kernel, ns=s),
        grid=(m // bm, o // bo, c // bk),
        in_specs=[
            pl.BlockSpec((bm, s, bk), lambda i, j, kk: (i, 0, kk)),
            pl.BlockSpec((s, bk, bo), lambda i, j, kk: (0, kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, s, bo), lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((m, s, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, s, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
    )(x, w)


def main():
    peak = 197.0  # v5e bf16 TFLOP/s
    print(f"{'site':>22} {'flat':>9} {'flatdot':>9} {'vmap5d':>9} "
          f"{'grouped':>9} {'dot':>9} {'pallas':>9}  (ms; sol in parens)")
    totals = {"vmap5d": 0.0, "grouped": 0.0, "dot": 0.0, "pallas": 0.0}
    tot_flops = 0.0
    for (ci, co, sp, count) in SITES:
        x = jax.random.normal(jax.random.key(0), (BATCH, sp, sp, S, ci),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (S, 1, 1, ci, co),
                              jnp.bfloat16)
        flops = 2 * BATCH * S * sp * sp * ci * co
        m = BATCH * sp * sp

        def conv1(xs, ws):
            return jax.lax.conv_general_dilated(
                xs, ws, (1, 1), "VALID", dimension_numbers=DN,
                preferred_element_type=jnp.bfloat16)

        @jax.jit
        def f_vmap(x, w):
            return jax.vmap(conv1, in_axes=(3, 0), out_axes=3)(x, w).sum()

        @jax.jit
        def f_grouped(x, w):
            xg = x.reshape(BATCH, sp, sp, S * ci)
            # fg=S grouped conv wants rhs (1,1,ci, S*co) with draw-major
            # output blocks: rhs[..., i, s*co+o] = w[s,...,i,o]
            wg = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(1, 1, ci, S * co)
            yg = jax.lax.conv_general_dilated(
                xg, wg, (1, 1), "VALID", dimension_numbers=DN,
                feature_group_count=S,
                preferred_element_type=jnp.bfloat16)
            return yg.sum()

        @jax.jit
        def f_dot(x, w):
            xr = x.reshape(m, S, ci)
            wr = w.reshape(S, ci, co)
            y = jax.lax.dot_general(
                xr, wr, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.bfloat16)  # (S, M, O)
            return y.sum()

        @jax.jit
        def f_pallas(x, w):
            xr = x.reshape(m, S, ci)
            wr = w.reshape(S, ci, co)
            return pallas_mc_gemm(xr, wr, 512, 256, 512).sum()

        # the flat det forms the 10x-det bound runs at the same site
        xf = jax.random.normal(jax.random.key(2),
                               (BATCH * S, sp, sp, ci), jnp.bfloat16)
        wf = jax.random.normal(jax.random.key(3), (1, 1, ci, co),
                               jnp.bfloat16)

        @jax.jit
        def f_flat(xf, wf):
            return jax.lax.conv_general_dilated(
                xf, wf, (1, 1), "VALID", dimension_numbers=DN,
                preferred_element_type=jnp.bfloat16).sum()

        @jax.jit
        def f_flatdot(xf, wf):
            return jnp.einsum("bhwc,co->bhwo", xf, wf[0, 0],
                              preferred_element_type=jnp.bfloat16).sum()

        row = {}
        for name, f in (("flat", f_flat), ("flatdot", f_flatdot)):
            t = step_time(f, xf, wf)
            row[name] = t
            totals.setdefault(name, 0.0)
            totals[name] += t * count
        for name, f in (("vmap5d", f_vmap), ("grouped", f_grouped),
                        ("dot", f_dot), ("pallas", f_pallas)):
            try:
                t = step_time(f, x, w)
            except Exception as e:  # noqa: BLE001
                print(f"  {name} failed: {str(e)[:100]}")
                t = float("inf")
            row[name] = t
            totals[name] += t * count
        tot_flops += flops * count
        print(f"{ci:>5}->{co:<5}@{sp:<3} x{count:<2}"
              + "".join(f" {row[n] * 1e3:7.3f}({flops / row[n] / 1e12 / peak:.2f})"
                        for n in ("flat", "flatdot", "vmap5d", "grouped",
                                  "dot", "pallas")))
    summary = {"metric": "rn50_1x1_mc_totals_ms"}
    for n, t in totals.items():
        summary[n] = round(t * 1e3, 2)
        summary[f"{n}_sol"] = round(tot_flops / t / 1e12 / peak, 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
