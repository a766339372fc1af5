"""K4 proper: fused int8 GEMM + requantization epilogue (Pallas/MXU).

The XLA int8 path materializes every conv/GEMM's s32 accumulator to HBM
(4 B/element) and then runs a separate requantize fusion over it. This
kernel keeps the s32 accumulator in VMEM and writes the requantized
uint8 activation directly.

STATUS (round-2 controlled A/B, ROADMAP.md): despite the fused
epilogue, routing ResNet-50's convs through this kernel LOSES to XLA's
conv + separate requant fusions (qresnet50 MC-1 bs32 NHWC: 3.80 ms
pure XLA vs 5.79 ms with 1x1 routing) because the Mosaic matmul
mainloop reaches only ~45-100 TOPS on v5e where XLA's own int8 dot
hits ~340 TOPS (87% of peak) — a codegen gap that block sizes, operand
layouts (NT vs NN), pre-centered s8 inputs, and dimension_semantics do
not close (and Pallas bf16 dots measure the same ~45 TOPS, so it is
not the int8 mode). Routing is default-off (ops/int8.py); the kernel
remains exact, tested, and available behind flags for shapes where a
fused epilogue matters more than mainloop throughput:

    out_q = clamp(round(acc * alpha + beta[n]), 0, 255)  (uint8)

with the zero-point correction FOLDED INTO beta (the reference applies
it as a second conv; VERDICT round-1 K4 asked for accumulator-init
folding):

    alpha  = x_scale * w_scale / out_scale
    beta_n = bias_n / out_scale + out_zp
             + (128 - x_zp) * colsum_n * alpha

Covers the uint8-activation x int8-weight GEMM shape used by qlinear,
by 1x1 convs in channels-last layout, and (with USE_INT8_IM2COL) by
spatial convs via uint8 im2col.

Replaces the reference delegation to torch.nn.quantized.functional
(quantize_linear_variational.py:172-189, oneDNN).

Mosaic notes (discovered by probing the v5e compiler): int16 casts and
direct f32->u8 casts SIGABRT the compiler; u8 loads/stores, u8->i32->s8
centering, s8 dot -> s32, and s8<->u8 bitcasts are all fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 512
_BN = 256
_BK = 256


def _interp():
    return (pltpu.InterpretParams()
            if jax.default_backend() != "tpu" else False)


def _kernel(alpha_ref, x_ref, w_ref, beta_ref, out_ref, acc_ref):
    """grid (M/bm, N/bn, K/bk), k innermost."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # center uint8 activations to int8: (x - 128) always fits s8
    x_c = (x_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        x_c, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = (acc_ref[:].astype(jnp.float32) * alpha_ref[0]
               + beta_ref[:])
        q = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.int32)
        # u8 store via the s8 bit pattern (f32->u8 casts are unsupported)
        v = ((q + 128) % 256) - 128
        out_ref[:] = pltpu.bitcast(v.astype(jnp.int8), jnp.uint8)


def _pad2(a, bm, bn):
    m, n = a.shape
    pm, pn = pl.cdiv(m, bm) * bm, pl.cdiv(n, bn) * bn
    if (pm, pn) != (m, n):
        a = jnp.pad(a, ((0, pm - m), (0, pn - n)))
    return a


@functools.partial(jax.jit, static_argnames=())
def _qmatmul(x_q, w_q, alpha, beta):
    M, K = x_q.shape
    N = w_q.shape[0]
    bm = min(_BM, pl.cdiv(M, 8) * 8)
    bn = min(_BN, pl.cdiv(N, 128) * 128)
    bk = min(_BK, pl.cdiv(K, 128) * 128)
    xp = _pad2(x_q, bm, bk)
    # padded K columns contribute (0 - 128)*w = 0 only if w is 0 there:
    # w is padded with zeros, so the centered-x times padded-w is 0. But
    # padded x rows would emit garbage rows — they are sliced off below.
    wp = _pad2(w_q, bn, bk)
    betap = jnp.pad(beta, (0, wp.shape[0] - N))[None, :]
    Mp, Kp = xp.shape
    Np = wp.shape[0]
    out = pl.pallas_call(
        _kernel,
        grid=(Mp // bm, Np // bn, Kp // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda m, n, k: (n, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interp(),
    )(jnp.asarray([alpha], jnp.float32), xp, wp, betap)
    return out[:M, :N]


def qmatmul_requant(x_q, x_scale, x_zp, w_q, w_scale, bias_f32,
                    out_scale, out_zp):
    """uint8 x (M, K) @ int8 w (N, K)^T -> requantized uint8 (M, N).

    Semantics identical to ops.int8.qlinear (round-half-even, clamp to
    [0, 255]); the s32 accumulator never exists in HBM.
    """
    alpha = x_scale * w_scale / out_scale
    colsum = jnp.sum(w_q.astype(jnp.int32), axis=1).astype(jnp.float32)
    beta = (128.0 - x_zp) * colsum * alpha + float(out_zp)
    if bias_f32 is not None:
        beta = beta + bias_f32.astype(jnp.float32) / out_scale
    return _qmatmul(x_q, w_q, jnp.float32(alpha), beta)
