"""INT8 quantized ops (K4 of SURVEY.md §2.4): sampled-GEMM/conv on the
MXU's native int8 path.

Replaces the reference's oneDNN delegation
(torch.ops.quantized.mul/add + torch.nn.quantized.functional.linear,
quantize_linear_variational.py:172-189) with XLA int8 dot/conv
(s8 x s8 -> s32 accumulate) plus explicit requantization arithmetic.

Conventions mirror the reference:
- weights: symmetric per-tensor int8, zero_point=0,
  scale = 2*clamp(max|x|, 0, 100)/255 (quantize_linear_variational.py
  :58-107), default_scale fallback when the tensor is all-zero;
- activations: affine uint8 (stored as uint8, zero_point typically 128);
- bias: fp32, never quantized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pallas fused GEMM+requant (K4): tri-state override for tests/benches.
# None resolves to OFF everywhere (measured A/B below). Env overrides
# (BTT_PALLAS_QMATMUL / BTT_INT8_IM2COL = 0|1) support controlled A/Bs.
USE_PALLAS_QMATMUL = None
# im2col routing of SPATIAL convs into the fused GEMM kernel (1x1 convs
# always qualify when the kernel is enabled). Separate explicit opt-in:
# it measured WORSE than 1x1-only routing (20.5 vs 5.79 ms, ROADMAP.md).
USE_INT8_IM2COL = None


def _env_flag(name):
    import os
    v = os.environ.get(name)
    if v is None or v.strip() == "":
        return None
    return v.strip().lower() not in ("0", "false", "off", "no")


def _pallas_qmatmul_enabled():
    # Default OFF (round-2 controlled A/B, qresnet50 MC-1 bs32 NHWC):
    # XLA int8 convs + their fused requant epilogues run the model at
    # 3.80 ms; routing 1x1 convs into the Pallas GEMM kernel gives
    # 5.79 ms and full im2col routing 20 ms. XLA's dot/conv epilogue
    # fusion beats the hand-written kernel at these shapes — the kernel
    # remains available (flags/env) and exact for cases where a fused
    # epilogue is not otherwise available.
    if USE_PALLAS_QMATMUL is not None:  # explicit code beats ambient env
        return USE_PALLAS_QMATMUL
    env = _env_flag("BTT_PALLAS_QMATMUL")
    if env is not None:
        return env
    return False


def _im2col_enabled():
    if USE_INT8_IM2COL is not None:
        return USE_INT8_IM2COL
    env = _env_flag("BTT_INT8_IM2COL")
    if env is not None:
        return env
    return False


def symmetric_scale(x, upper_bound=100.0, target_range=255.0,
                    default_scale=0.1):
    """Reference scale rule: 2*clamp(max|x|,0,upper)/range, 0 -> default."""
    xmax = jnp.clip(jnp.max(jnp.abs(x)), 0.0, upper_bound)
    scale = xmax * 2.0 / target_range
    return jnp.where(scale == 0, default_scale, scale)


def quantize_int8(x, scale):
    """Symmetric int8 (zero_point = 0). Divisions by (possibly traced)
    scales are written as multiply-by-reciprocal: a traced scalar
    divisor otherwise lowers to a per-element divide.

    Rounding contract (here and in every reciprocal-rewritten quantize/
    requantize below): when 1/scale is not exactly representable,
    round-half-even ties can land 1 LSB away from torch's round(x/s).
    The torch-oracle tests therefore assert agreement to ±1 quantum,
    never bit-exactness (tests/test_quantization.py)."""
    q = jnp.round(x * (1.0 / scale))
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def quantize_uint8(x, scale, zero_point):
    q = jnp.round(x * (1.0 / scale)) + zero_point
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


def dequantize(q, scale, zero_point=0):
    return (q.astype(jnp.float32) - zero_point) * scale


def requantize_int8(acc_f32, out_scale, out_zp=0):
    q = jnp.round(acc_f32 * (1.0 / out_scale)) + out_zp
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def _clip_range(dtype):
    return (0, 255) if dtype == jnp.uint8 else (-128, 127)


def qmul(a_q, a_scale, b_q, b_scale, out_scale, out_zp=0, *,
         a_zp=0, b_zp=0, out_dtype=jnp.int8):
    """torch.ops.quantized.mul equivalent:
    out_q = clamp(round(a_deq * b_deq / out_scale) + out_zp)."""
    a_c = a_q.astype(jnp.int32) - jnp.int32(a_zp)
    b_c = b_q.astype(jnp.int32) - jnp.int32(b_zp)
    prod = (a_c * b_c).astype(jnp.float32) * (a_scale * b_scale
                                               * (1.0 / out_scale))
    lo, hi = _clip_range(out_dtype)
    q = jnp.round(prod) + out_zp
    return jnp.clip(q, lo, hi).astype(out_dtype)


def qadd(a_q, a_scale, b_q, b_scale, out_scale, out_zp=0, *,
         a_zp=0, b_zp=0, out_dtype=jnp.int8):
    """torch.ops.quantized.add equivalent."""
    inv = 1.0 / out_scale
    s = ((a_q.astype(jnp.float32) - a_zp) * (a_scale * inv)
         + (b_q.astype(jnp.float32) - b_zp) * (b_scale * inv))
    lo, hi = _clip_range(out_dtype)
    q = jnp.round(s) + out_zp
    return jnp.clip(q, lo, hi).astype(out_dtype)


def qlinear(x_q, x_scale, x_zp, w_q, w_scale, bias_f32, out_scale, out_zp):
    """uint8 activation x int8 weight -> uint8 activation.

    int8 dot with s32 accumulation on the MXU; bias fp32; requantize to
    the calibrated output scale. Matches
    torch.nn.quantized.functional.linear semantics.

    The activation is re-centered as (x_q - 128), which always fits
    int8, and the constant (128 - zp) shift is restored through a
    per-output correction using the weight column sums — this keeps
    both GEMM operands int8 for the MXU instead of upcasting.

    With the (opt-in) Pallas routing the whole thing runs as ONE
    fused s32-accumulate + requantize kernel (ops/pallas/qmatmul.py)
    so the s32 accumulator never exists in HBM — default-off after the
    measured A/B (see _pallas_qmatmul_enabled).
    """
    if _pallas_qmatmul_enabled():
        from bayesian_torch_tpu.ops.pallas.qmatmul import qmatmul_requant
        lead = x_q.shape[:-1]
        k = x_q.shape[-1]
        out = qmatmul_requant(x_q.reshape(-1, k), x_scale, x_zp, w_q,
                              w_scale, bias_f32, out_scale, out_zp)
        return out.reshape(lead + (w_q.shape[0],))
    x_c = (x_q.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_c, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # sum w (x_q - zp) = sum w (x_q - 128) + (128 - zp) * sum w
    # (skipped entirely for the common static zp == 128)
    if not (isinstance(x_zp, (int, float)) and x_zp == 128):
        w_colsum = jnp.sum(w_q.astype(jnp.int32), axis=1)
        acc = acc + (128 - jnp.int32(x_zp)) * w_colsum
    inv = 1.0 / out_scale
    out = acc.astype(jnp.float32) * (x_scale * w_scale * inv)
    if bias_f32 is not None:
        out = out + bias_f32 * inv
    q = jnp.round(out) + out_zp
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


def qconv(x_q, x_scale, x_zp, w_q, w_scale, bias_f32, out_scale, out_zp, *,
          stride=1, padding=0, dilation=1, groups=1, transposed=False,
          output_padding=0, data_format="NCHW"):
    """uint8 activation x int8 kernel conv -> uint8 activation.

    Activations are re-centered as (x_q - 128) so both conv operands are
    int8 for the MXU; the (128 - zp) shift is restored with a
    border-exact correction sum_valid_taps w * (128 - zp). Because the
    shift is constant across input channels, the correction collapses to
    a conv of a SINGLE-channel ones image against the channel-summed
    kernel — in_channels-per-group of 1, so its cost is ~C_in times
    smaller than the naive full ones-conv (which round 1 measured at a
    2x step cost; VERDICT.md K4). Exact including zero-padded borders
    (padding represents the real value 0 = quantized zp, exactly as
    torch's quantized conv pads with zp).
    """
    nd = x_q.ndim - 2

    def _as_tuple(v):
        return (v,) * nd if isinstance(v, int) else tuple(v)

    # 1x1 channels-last convs ARE GEMMs (stride becomes a spatial
    # slice): route through the fused Pallas kernel when enabled. The
    # XLA-dot formulation was measured SLOWER than XLA's native conv
    # (7.4 vs 5.9 ms e2e), so without Pallas the conv path stays.
    if (_pallas_qmatmul_enabled() and not transposed and groups == 1
            and data_format.endswith("C")
            and all(k == 1 for k in w_q.shape[2:])
            and all(p == 0 for p in _as_tuple(padding))
            and all(d == 1 for d in _as_tuple(dilation))):
        sl = ((slice(None),)
              + tuple(slice(None, None, s) for s in _as_tuple(stride))
              + (slice(None),))
        x_s = x_q[sl]
        cin = x_s.shape[-1]
        out = qlinear(x_s.reshape(-1, cin), x_scale, x_zp,
                      w_q.reshape(w_q.shape[0], cin), w_scale,
                      bias_f32, out_scale, out_zp)
        return out.reshape(x_s.shape[:-1] + (w_q.shape[0],))

    # Spatial channels-last convs: uint8 im2col -> the SAME fused
    # Pallas GEMM+requant kernel. At int8 precision the patch tensor's
    # k*k blowup is cheap (uint8 bytes; ~0.1-0.3 ms across all of
    # ResNet-50), and it buys the same property the 1x1 path has: the
    # s32 accumulator and the requantize epilogue stay fused in VMEM
    # instead of costing two extra HBM passes per conv (the measured
    # dominant int8 overhead — ROADMAP.md). Padding with the activation
    # zero-point makes borders exact automatically: the kernel computes
    # sum w*(x_q - zp), and padded taps hold x_q == zp, contributing 0.
    if (_pallas_qmatmul_enabled() and _im2col_enabled()
            and not transposed and groups == 1
            and data_format.endswith("C") and x_q.ndim == nd + 2
            and isinstance(x_zp, (int, float))):
        k = w_q.shape[2:]
        st, pd, dl = _as_tuple(stride), _as_tuple(padding), _as_tuple(
            dilation)
        zp_u8 = jnp.uint8(int(x_zp))
        pad_cfg = ((0, 0),) + tuple((p, p) for p in pd) + ((0, 0),)
        xp = jnp.pad(x_q, pad_cfg, constant_values=zp_u8)
        sp_in = xp.shape[1:-1]
        out_sp = tuple(
            (sp_in[i] - dl[i] * (k[i] - 1) - 1) // st[i] + 1
            for i in range(nd))
        # one strided slice per tap, stacked on a new trailing tap axis
        taps = []
        from itertools import product
        for offs in product(*(range(ki) for ki in k)):
            sl = (slice(None),) + tuple(
                slice(offs[i] * dl[i],
                      offs[i] * dl[i] + st[i] * (out_sp[i] - 1) + 1,
                      st[i])
                for i in range(nd)) + (slice(None),)
            taps.append(xp[sl])
        patches = jnp.stack(taps, axis=-2)  # (B, *out_sp, k*k, C)
        kk = patches.shape[-2]
        cin = x_q.shape[-1]
        import math
        m = patches.shape[0] * math.prod(out_sp)
        # w (O, I, *k) -> (O, (*k, I) flat) to match the patch order
        w2 = jnp.moveaxis(w_q, 1, -1).reshape(w_q.shape[0], kk * cin)
        out = qlinear(patches.reshape(m, kk * cin), x_scale, x_zp, w2,
                      w_scale, bias_f32, out_scale, out_zp)
        return out.reshape((x_q.shape[0],) + out_sp + (w_q.shape[0],))

    from bayesian_torch_tpu.ops import conv as conv_ops

    def _conv(x, w, g):
        if transposed:
            return conv_ops.conv_transpose_nd(
                x, w, None, stride=stride, padding=padding,
                output_padding=output_padding, dilation=dilation,
                groups=g, data_format=data_format, compute_dtype=None)
        return conv_ops.conv_nd(
            x, w, None, stride=stride, padding=padding,
            dilation=dilation, groups=g, data_format=data_format,
            compute_dtype=None)

    x_c = (x_q.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = _conv(x_c, w_q, groups)

    skip_corr = isinstance(x_zp, (int, float)) and x_zp == 128

    if not skip_corr:
        # channel-summed correction kernel (integer-valued; exact in
        # f32: |sum| <= 127 * C_in/g * prod(k) << 2^24)
        k = w_q.shape[2:]
        if transposed:
            # (I, O/g, *k) -> (g, I/g, O/g, *k) -> sum in -> (g, O/g, *k)
            s = w_q.astype(jnp.float32).reshape(
                (groups, w_q.shape[0] // groups, w_q.shape[1]) + k
            ).sum(axis=1)
        else:
            # (O, I/g, *k) -> sum in-channels -> (O, 1, *k)
            s = w_q.astype(jnp.float32).sum(axis=1, keepdims=True)
        if data_format.endswith("C"):
            ones1 = jnp.ones((1,) + x_q.shape[1:-1] + (groups,),
                             jnp.float32)
        else:
            ones1 = jnp.ones((1, groups) + x_q.shape[2:], jnp.float32)
        corr = _conv(ones1, s, groups).astype(jnp.int32)  # (1, O, *out)
        acc = acc + (128 - jnp.int32(x_zp)) * corr
    inv = 1.0 / out_scale
    out = acc.astype(jnp.float32) * (x_scale * w_scale * inv)
    if bias_f32 is not None:
        shape = ((1, -1) + (1,) * nd) if not data_format.endswith("C") \
            else ((1,) * (nd + 1) + (-1,))
        out = out + bias_f32.reshape(shape) * inv
    q = jnp.round(out) + out_zp
    return jnp.clip(q, 0, 255).astype(jnp.uint8)
