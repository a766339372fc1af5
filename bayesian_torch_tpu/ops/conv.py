"""Sampled / Flipout N-d convolution ops (K1/K2 conv flavors), XLA path.

Implements torch-semantics conv and conv-transpose on
``lax.conv_general_dilated`` with torch parameter layouts, so posteriors
(mu_kernel/rho_kernel) are checkpoint- and MOPED-compatible with the
reference:

- Conv:          kernel (out_ch, in_ch // groups, *k)   [OIHW-style]
- ConvTranspose: kernel (in_ch, out_ch // groups, *k)   [IOHW-style]
- activations NC*: (N, C, *spatial), matching the reference models.

Reference delegation sites replaced: conv_variational.py:361-380 (sampled
conv) and conv_flipout.py:370-433 (dual-conv flipout).

TPU note: XLA's layout assignment relayouts NCHW convs onto the MXU's
preferred tiling automatically; keeping the torch logical layout costs a
transpose at graph edges only, not per-op.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from bayesian_torch_tpu.ops.sampling import (normal_squeezed,
                                             sample_gaussian_weight,
                                             sigma_from_rho)


def _ntuple(x, n) -> Tuple[int, ...]:
    if isinstance(x, (tuple, list)):
        assert len(x) == n, f"expected {n}-tuple, got {x}"
        return tuple(int(v) for v in x)
    return (int(x),) * n


def _dim_numbers(nd: int, data_format: str = "NCHW") -> Tuple[str, str, str]:
    """Kernel is always torch-layout OIHW; activations NC* or N*C."""
    spatial = "DHW"[3 - nd:]
    act = ("N" + spatial + "C") if data_format.endswith("C") else \
        ("NC" + spatial)
    return (act, "OI" + spatial, act)


def _accum_dtype(x, compute_dtype=None):
    # int8 operands accumulate in int32 on the MXU. For floats, the MXU
    # always accumulates in fp32 internally; when a compute_dtype is set
    # the conv RESULT is emitted in that dtype directly, which removes a
    # full fp32 elementwise pass over the activations (profiling showed
    # fp32 BN/ReLU/cast passes dominating the step time).
    if jnp.issubdtype(x.dtype, jnp.integer):
        return jnp.int32
    return jnp.float32 if compute_dtype is None else compute_dtype


def _bias_shape(nd: int, data_format: str) -> Tuple[int, ...]:
    if data_format.endswith("C"):
        return (1,) * (nd + 1) + (-1,)
    return (1, -1) + (1,) * nd


# Emit pointwise (1x1, stride-1, pad-0, groups-1, channels-last) convs
# as a plain dot over the channel axis instead of conv_general_dilated.
# Measured (benchmarks/bench_1x1_emission.py + model-level A/B on v5e):
# for UNBATCHED weights (deterministic models) the dot emission runs the
# det RN50 flagship ~9% faster than XLA's own 1x1-conv codegen
# (119.4 -> 109.6 ms at bs=1280 bf16 NHWC). Under the MC vmap it is a
# LOSS (134.4 -> 161.1 ms full / 138.4 ms selective-shapes): the
# batched-dot outputs stop fusing with the residual-add/ReLU/BN chains
# (profiled: ~12 ms add_maximum fusions appear), so the Bayesian paths
# keep conv emission. Pure emission choice — identical math (both
# accumulate fp32 on the MXU). ``CONV_1X1_DOT`` is the process default
# (False); per-call ``pointwise_dot`` overrides it (det nn modules pass
# True). A set of (in_ch, out_ch) pairs restricts to those shapes.
CONV_1X1_DOT = False


def _is_pointwise(w, stride, pad, dilation, groups, data_format,
                  pointwise_dot):
    enable = CONV_1X1_DOT if pointwise_dot is None else pointwise_dot
    if not enable:
        return False
    if isinstance(enable, (set, frozenset)) and \
            (w.shape[1], w.shape[0]) not in enable:
        return False
    return (data_format.endswith("C") and groups == 1
            and all(k == 1 for k in w.shape[2:])
            and all(s == 1 for s in stride)
            and all(d == 1 for d in dilation)
            and not isinstance(pad, str)
            and all(p == (0, 0) for p in pad))


def conv_nd(x, w, b=None, *, stride=1, padding=0, dilation=1, groups=1,
            compute_dtype=None, data_format="NCHW", pointwise_dot=None):
    """torch.nn.functional.conv{1,2,3}d semantics.

    ``padding`` may also be 'SAME'/'VALID' (lax strings) for models
    converted from flax. ``data_format`` 'NCHW' (torch default) or
    'NHWC' (TPU-friendly channels-last; kernel layout stays OIHW).
    """
    nd = x.ndim - 2
    stride = _ntuple(stride, nd)
    dilation = _ntuple(dilation, nd)
    if isinstance(padding, str):
        pad = padding.upper()
    else:
        pad = [(p, p) for p in _ntuple(padding, nd)]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if _is_pointwise(w, stride, pad, dilation, groups, data_format,
                     pointwise_dot):
        out = jnp.einsum(
            "...c,oc->...o", x, w.reshape(w.shape[:2]),
            preferred_element_type=_accum_dtype(x, compute_dtype))
        if b is not None:
            out = out + b.astype(out.dtype).reshape(
                _bias_shape(nd, data_format))
        return checkpoint_name(out, "conv_out")
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=_dim_numbers(nd, data_format),
        feature_group_count=groups,
        preferred_element_type=_accum_dtype(x, compute_dtype),
    )
    if b is not None:
        out = out + b.astype(out.dtype).reshape(_bias_shape(nd, data_format))
    # Names the conv result for remat policies: under
    # LargeResNet(remat_blocks="conv_out") the block remat saves conv
    # outputs and recomputes only the elementwise BN/ReLU chains
    # (jax.checkpoint_policies.save_only_these_names). A no-op outside
    # a named-policy checkpoint.
    return checkpoint_name(out, "conv_out")


def conv_transpose_nd(x, w, b=None, *, stride=1, padding=0,
                      output_padding=0, dilation=1, groups=1,
                      compute_dtype=None, data_format="NCHW"):
    """torch.nn.functional.conv_transpose{1,2,3}d semantics.

    Expressed as a fractionally-strided regular conv: lhs_dilation=stride,
    spatially-flipped kernel with (I, O/g, *k) -> (O, I/g, *k) regrouping,
    and per-dim padding (d*(k-1)-p, d*(k-1)-p+op).
    """
    nd = x.ndim - 2
    if isinstance(padding, str):
        raise ValueError("string padding is not supported for transposed "
                         "convolutions; pass explicit ints")
    stride = _ntuple(stride, nd)
    padding = _ntuple(padding, nd)
    output_padding = _ntuple(output_padding, nd)
    dilation = _ntuple(dilation, nd)

    in_ch = w.shape[0]
    out_ch_per_g = w.shape[1]
    k = w.shape[2:]
    # (I, O/g, *k) -> (g, I/g, O/g, *k) -> (g, O/g, I/g, *k) -> (O, I/g, *k)
    wg = w.reshape((groups, in_ch // groups, out_ch_per_g) + k)
    wg = jnp.swapaxes(wg, 1, 2)
    w_conv = wg.reshape((groups * out_ch_per_g, in_ch // groups) + k)
    w_conv = jnp.flip(w_conv, axis=tuple(range(2, 2 + nd)))

    pads = [
        (dilation[i] * (k[i] - 1) - padding[i],
         dilation[i] * (k[i] - 1) - padding[i] + output_padding[i])
        for i in range(nd)
    ]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_conv = w_conv.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w_conv,
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=_dim_numbers(nd, data_format),
        feature_group_count=groups,
        preferred_element_type=_accum_dtype(x, compute_dtype),
    )
    if b is not None:
        out = out + b.astype(out.dtype).reshape(_bias_shape(nd, data_format))
    return checkpoint_name(out, "conv_out")


def _apply_conv(x, w, b, transposed, *, stride, padding, output_padding,
                dilation, groups, compute_dtype, data_format="NCHW"):
    if transposed:
        return conv_transpose_nd(
            x, w, b, stride=stride, padding=padding,
            output_padding=output_padding, dilation=dilation, groups=groups,
            compute_dtype=compute_dtype, data_format=data_format)
    return conv_nd(x, w, b, stride=stride, padding=padding,
                   dilation=dilation, groups=groups,
                   compute_dtype=compute_dtype, data_format=data_format)


def sampled_conv(x, key, mu_k, rho_k, mu_b=None, rho_b=None, *,
                 stride=1, padding=0, output_padding=0, dilation=1,
                 groups=1, transposed=False, eps_k=None, eps_b=None,
                 compute_dtype=None, data_format="NCHW"):
    """Reparameterization conv: sample kernel (and bias), then convolve.

    Reference: conv_variational.py:357-380.
    """
    kw, kb = jax.random.split(key)
    if compute_dtype is not None:
        # sample directly in the compute dtype (see ops/linear.py)
        mu_k, rho_k = mu_k.astype(compute_dtype), rho_k.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_k is not None:
            eps_k = eps_k.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)
    w, _ = sample_gaussian_weight(kw, mu_k, rho_k, eps=eps_k)
    b = None
    if mu_b is not None:
        b, _ = sample_gaussian_weight(kb, mu_b, rho_b, eps=eps_b)
    return _apply_conv(x, w, b, transposed, stride=stride, padding=padding,
                       output_padding=output_padding, dilation=dilation,
                       groups=groups, compute_dtype=compute_dtype,
                       data_format=data_format)


# How flipout's mean+perturbation convs are emitted (A/B'd on TPU):
#
# - "two":   mean conv + pert conv as separate lax convs (round-2 path).
#   Under MC-vmap the pert conv (per-draw weights) batches into the fast
#   grouped form, but the mean conv (shared mu) batch-merges into a flat
#   (mc*B)-batch conv, which XLA runs at ~29% SoL on v5e vs ~40% for
#   the grouped form (profiled: the whole flipout step is 96% conv
#   fusions; the "overhead" vs 2x-reparam is the mean convs' slower
#   conv ceiling, not elementwise work).
# - "tile":  same two convs, but the mean conv's weights are made
#   draw-dependent (mu + 0*delta) so vmap emits it as a grouped conv
#   too; XLA folds the zero but keeps the grouped structure.
# - "fused": ONE feature_group_count=2*groups conv over
#   concat([x, x*s_in], C) with concat([mu, delta], O): computes both
#   halves in a single bigger MXU op; epilogue adds the halves.
#
# Measured (RN50 MC-10 NHWC, v5e): two@bs128 332 ms (385.9 imgs/s);
# fused@bs128 560 ms (concat + doubled conv temps); tile@bs128 OOMs
# (17.7G > 15.75G HBM: the combine holds mean+pert halves of the fast
# form concurrently), tile@bs96 318 ms (302 imgs/s — the fast conv
# form is ~2.08 ms/img vs two's 2.5, but vmap's bdim normalization
# adds ~1.15 ms/img of sign/transpose fusions and bs<128 regresses).
# See doc/PROFILE_r03.md. Default: "two".
FLIPOUT_CONV_MODE = "two"


def _flipout_combined_conv(x, x_pert, mu_k, delta_k, mu_b, pert_bias,
                           transposed, *, stride, padding,
                           output_padding, dilation, groups,
                           compute_dtype, data_format):
    """One grouped conv computing the mean and perturbation halves.

    lhs = concat([x, x*s_in], channel); rhs = concat([mu, delta]) with
    feature (or transposed input-channel) groups doubled, so output
    channels split into [mean | pert]; the epilogue recombines
    mean + pert*s_out (+ biases) in one fused elementwise pass.
    """
    nd = x.ndim - 2
    ch_axis = (nd + 1) if data_format.endswith("C") else 1
    z = jnp.concatenate([x, x_pert], axis=ch_axis)
    if transposed:
        # (I, O/g, *k): input-channel groups; doubling groups keeps
        # O/g per group, out channels ordered [mean-groups | pert]
        w_cat = jnp.concatenate([mu_k, delta_k], axis=0)
    else:
        # (O, I/g, *k): output blocks per input group
        w_cat = jnp.concatenate([mu_k, delta_k], axis=0)
    y = _apply_conv(z, w_cat, None, transposed, stride=stride,
                    padding=padding, output_padding=output_padding,
                    dilation=dilation, groups=2 * groups,
                    compute_dtype=compute_dtype, data_format=data_format)
    out_ch = y.shape[ch_axis] // 2
    mean_half = jax.lax.slice_in_dim(y, 0, out_ch, axis=ch_axis)
    pert_half = jax.lax.slice_in_dim(y, out_ch, 2 * out_ch, axis=ch_axis)
    bshape = _bias_shape(nd, data_format)
    if mu_b is not None:
        mean_half = mean_half + mu_b.astype(y.dtype).reshape(bshape)
    if pert_bias is not None:
        pert_half = pert_half + pert_bias.astype(y.dtype).reshape(bshape)
    return mean_half, pert_half


def flipout_conv_structured(x, key, num_mc, mu_k, rho_k, mu_b=None,
                            rho_b=None, *, stride=1, padding=0,
                            dilation=1, groups=1, compute_dtype=None,
                            eps_k=None, eps_b=None, sign_in=None,
                            sign_out=None):
    """Flipout conv over an EXPLICIT channel-tiled MC axis (no vmap).

    ``x`` is (B, *spatial, S*C) with draw s occupying channel block s
    (or (B, *spatial, C) at the stem — tiled here). Returns
    (B, *spatial, S*O). Both the mean conv (mu tiled S times) and the
    perturbation conv (per-draw delta) run as feature_group_count=S
    grouped convs — the fast (B, *sp, S, C) form the reparam flagship
    gets from vmap — and the Rademacher sign tensors are iota-hashed
    directly in this axis order, so no batching-dim normalization
    transposes exist anywhere (the ~1.15 ms/img vmap tax measured on
    the tile mode, doc/PROFILE_r03.md). Math identical to
    ``flipout_conv`` per draw; channels-last only, groups=1 only.
    """
    from bayesian_torch_tpu.ops.sampling import rademacher_fused

    if groups != 1:
        raise NotImplementedError(
            "structured flipout conv supports groups=1 only")
    S = num_mc
    out_ch = mu_k.shape[0]
    in_ch = mu_k.shape[1]
    k_eps, k_epsb, k_sin, k_sout = jax.random.split(key, 4)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        mu_k, rho_k = mu_k.astype(compute_dtype), rho_k.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_k is not None:
            eps_k = eps_k.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)

    stem = x.shape[-1] == in_ch  # shared (un-tiled) input
    if stem:
        x_tiled = jnp.tile(x, (1,) * (x.ndim - 1) + (S,))
    else:
        assert x.shape[-1] == S * in_ch, (x.shape, S, in_ch)
        x_tiled = x

    sigma_k = sigma_from_rho(rho_k)
    if eps_k is None:
        eps_k = normal_squeezed(k_eps, (S,) + mu_k.shape, mu_k.dtype)
    delta = (sigma_k * eps_k).reshape((S * out_ch,) + mu_k.shape[1:])

    b_mean = b_pert = None
    if mu_b is not None:
        b_mean = jnp.tile(mu_b, S)
        sigma_b = sigma_from_rho(rho_b)
        if eps_b is None:
            eps_b = jax.random.normal(k_epsb, (S,) + mu_b.shape,
                                      mu_b.dtype)
        b_pert = (sigma_b * eps_b).reshape(S * out_ch)

    if sign_in is None:
        sign_in = rademacher_fused(k_sin, x_tiled.shape, x_tiled.dtype)

    df = "N" + "DHW"[3 - (x.ndim - 2):] + "C"
    if stem:
        # shared input: the mean conv runs ONCE (O channels) and its
        # result broadcasts across draws in the combine epilogue —
        # 1/S the mean-conv FLOPs of the tiled form
        mean_1 = conv_nd(x, mu_k, mu_b, stride=stride, padding=padding,
                         dilation=dilation, groups=1,
                         compute_dtype=compute_dtype, data_format=df)
        mean_out = jnp.tile(mean_1, (1,) * (mean_1.ndim - 1) + (S,))
        if b_mean is not None:
            b_mean = None  # already applied in mean_1
    else:
        mu_tiled = jnp.tile(mu_k, (S,) + (1,) * (mu_k.ndim - 1))
        mean_out = conv_nd(x_tiled, mu_tiled, b_mean, stride=stride,
                           padding=padding, dilation=dilation, groups=S,
                           compute_dtype=compute_dtype, data_format=df)
    pert = conv_nd(x_tiled * sign_in, delta, b_pert, stride=stride,
                   padding=padding, dilation=dilation, groups=S,
                   compute_dtype=compute_dtype, data_format=df)
    if sign_out is None:
        sign_out = rademacher_fused(k_sout, mean_out.shape,
                                    mean_out.dtype)
    return mean_out + pert * sign_out


def sampled_conv_structured(x, key, num_mc, mu_k, rho_k, mu_b=None,
                            rho_b=None, *, stride=1, padding=0,
                            dilation=1, groups=1, compute_dtype=None,
                            eps_k=None, eps_b=None):
    """Reparameterization conv over an EXPLICIT channel-tiled MC axis.

    Same representation contract as ``flipout_conv_structured``: input
    (B, *sp, S*C) (or (B, *sp, C) at the stem — where per-draw sampled
    filters simply stack as S*O output channels with NO input tiling),
    output (B, *sp, S*O), fg=S grouped conv with per-draw sampled
    weights W_s = mu + sigma*eps_s. Channels-last, groups=1 only.
    """
    if groups != 1:
        raise NotImplementedError(
            "structured sampled conv supports groups=1 only")
    S = num_mc
    out_ch, in_ch = mu_k.shape[0], mu_k.shape[1]
    kw, kb = jax.random.split(key)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        mu_k, rho_k = mu_k.astype(compute_dtype), rho_k.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_k is not None:
            eps_k = eps_k.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)

    sigma_k = sigma_from_rho(rho_k)
    if eps_k is None:
        eps_k = normal_squeezed(kw, (S,) + mu_k.shape, mu_k.dtype)
    w = (mu_k + sigma_k * eps_k).reshape((S * out_ch,) + mu_k.shape[1:])
    b = None
    if mu_b is not None:
        sigma_b = sigma_from_rho(rho_b)
        if eps_b is None:
            eps_b = jax.random.normal(kb, (S,) + mu_b.shape, mu_b.dtype)
        b = (mu_b + sigma_b * eps_b).reshape(S * out_ch)

    df = "N" + "DHW"[3 - (x.ndim - 2):] + "C"
    if x.shape[-1] == in_ch:  # stem: shared input, filters stack on O
        return conv_nd(x, w, b, stride=stride, padding=padding,
                       dilation=dilation, groups=1,
                       compute_dtype=compute_dtype, data_format=df)
    assert x.shape[-1] == S * in_ch, (x.shape, S, in_ch)
    return conv_nd(x, w, b, stride=stride, padding=padding,
                   dilation=dilation, groups=S,
                   compute_dtype=compute_dtype, data_format=df)


def flipout_conv(x, key, mu_k, rho_k, mu_b=None, rho_b=None, *,
                 stride=1, padding=0, output_padding=0, dilation=1,
                 groups=1, transposed=False, eps_k=None, eps_b=None,
                 sign_in=None, sign_out=None, compute_dtype=None,
                 data_format="NCHW", mode=None):
    """Flipout conv: mean conv + sign-flipped perturbation conv.

    Matches reference conv_flipout.py:370-433: the mean conv carries
    mu_bias; the perturbation conv carries only sigma_b*eps_b. The
    emission strategy (``mode`` / FLIPOUT_CONV_MODE) is a pure
    performance choice — all three produce identical math.
    """
    from bayesian_torch_tpu.ops.sampling import rademacher_fused

    mode = mode or FLIPOUT_CONV_MODE
    k_eps, k_epsb, k_sin, k_sout = jax.random.split(key, 4)
    if compute_dtype is not None:
        # sample and sign-flip in the compute dtype: halves the sampling
        # and sign-multiply HBM traffic (see ops/linear.py)
        x = x.astype(compute_dtype)
        mu_k, rho_k = mu_k.astype(compute_dtype), rho_k.astype(compute_dtype)
        if mu_b is not None:
            mu_b = mu_b.astype(compute_dtype)
            rho_b = rho_b.astype(compute_dtype)
        if eps_k is not None:
            eps_k = eps_k.astype(compute_dtype)
        if eps_b is not None:
            eps_b = eps_b.astype(compute_dtype)

    sigma_k = sigma_from_rho(rho_k)
    if eps_k is None:
        eps_k = normal_squeezed(k_eps, mu_k.shape, mu_k.dtype)
    delta_k = sigma_k * eps_k

    pert_bias = None
    if mu_b is not None:
        sigma_b = sigma_from_rho(rho_b)
        if eps_b is None:
            eps_b = jax.random.normal(k_epsb, mu_b.shape, mu_b.dtype)
        pert_bias = sigma_b * eps_b

    if sign_in is None:
        sign_in = rademacher_fused(k_sin, x.shape, x.dtype)

    if mode == "fused":
        mean_out, pert = _flipout_combined_conv(
            x, x * sign_in, mu_k, delta_k, mu_b, pert_bias,
            transposed, stride=stride, padding=padding,
            output_padding=output_padding, dilation=dilation,
            groups=groups, compute_dtype=compute_dtype,
            data_format=data_format)
        if sign_out is None:
            sign_out = rademacher_fused(k_sout, mean_out.shape,
                                        mean_out.dtype)
        return mean_out + pert * sign_out

    mu_conv = mu_k
    if mode == "tile":
        # make the mean conv's rhs draw-dependent so an outer MC-vmap
        # emits it as a grouped conv (XLA folds the zero, keeps the
        # grouped structure — measured faster than the flat batch-merge)
        mu_conv = mu_k + 0.0 * delta_k
    mean_out = _apply_conv(x, mu_conv, mu_b, transposed, stride=stride,
                           padding=padding, output_padding=output_padding,
                           dilation=dilation, groups=groups,
                           compute_dtype=compute_dtype,
                           data_format=data_format)
    if sign_out is None:
        sign_out = rademacher_fused(k_sout, mean_out.shape, mean_out.dtype)

    pert = _apply_conv(x * sign_in, delta_k, pert_bias, transposed,
                       stride=stride, padding=padding,
                       output_padding=output_padding, dilation=dilation,
                       groups=groups, compute_dtype=compute_dtype,
                       data_format=data_format)
    return mean_out + pert * sign_out
