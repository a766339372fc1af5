"""Monte-Carlo sample parallelism: vmapped MC axis, sharded over chips.

The reference runs MC sampling as a Python loop calling the model
``num_mc`` times (main_bayesian_mnist.py:27-32,
main_bayesian_cifar.py:501-503). TPU-native re-design: the MC axis is a
``vmap`` dimension over the model's noise-RNG state (params broadcast),
compiled once; on a ('mc','data') mesh XLA partitions the vmapped
computation across chips, so 10 MC samples of ResNet-50 run as one
program at roughly the cost structure of a 10x-larger batch. This is
the BASELINE.json north-star mechanism.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mc_vmap(num_mc: int):
    """Decorator: lift ``f(model, *args)`` over a leading MC axis.

    The model's 'noise' RNG stream is split ``num_mc`` ways (independent
    weight draws per sample); parameters and inputs broadcast.

        @mc_vmap(10)
        def forward(model, x):
            out, kl = model(x)
            return out, kl

        outs, kls = forward(model, x)   # outs: (10, B, ...)
    """
    state_axes = nnx.StateAxes({"noise": 0, ...: None})

    def decorator(f):
        import functools

        @functools.wraps(f)
        def wrapper(model, *args):
            vf = nnx.split_rngs(splits=num_mc, only="noise")(
                nnx.vmap(f, in_axes=(state_axes,) + (None,) * len(args),
                         out_axes=0))
            return vf(model, *args)

        return wrapper

    return decorator


def _presample_layers(model, num_mc, estimators=None):
    """Draw all layers' MC weight sets with the fused Pallas batch
    sampler (K1) and attach them as Presampled variables. Returns the
    list of (layer, attr_names) to clean up.

    reparam layers get W_s = mu + sigma*eps_s; flipout layers get
    delta_s = sigma*eps_s (their mean path reads mu directly). Biases
    are tiny and sampled with plain XLA. Sampling happens OUTSIDE the
    vmapped region — the Presampled axis is mapped by state_axes.
    """
    import jax.numpy as jnp

    from bayesian_torch_tpu.layers.base_variational_layer import Presampled
    from bayesian_torch_tpu.models.dnn_to_bnn import iter_bayesian_layers
    from bayesian_torch_tpu.ops.pallas import sample_scaled_normals_batch
    from bayesian_torch_tpu.ops.sampling import sigma_from_rho

    # Aggregate every layer's parameters into ONE flat buffer and run a
    # single kernel invocation: per-layer pallas launches and padding
    # were measured to cost more than they saved.
    #
    # LAYOUT: conv kernels go through the sampler in (*k, O, I) order.
    # XLA's preferred conv weight layout is {1,0,3,2} (I minor, then O,
    # then spatial) — the default row-major layout of a (*k, O, I)
    # buffer — so the transpose back to the logical (O, I, *k) becomes
    # a free bitcast and the conv consumes the sampled tile WITHOUT the
    # 11.7 ms/step relayout copy that sank round 1's presample path
    # (measured: conv feed 5.9 ms natural-order vs 3.35 ms this way,
    # matching the 3.17 ms XLA-sampled baseline).
    entries = []  # (layer, est, t_shape, inv_perm, n)
    mus, sigmas = [], []
    key = None
    for layer in iter_bayesian_layers(model):
        est = getattr(layer, "estimator", None)
        if est is None:
            est = ("flipout" if type(layer).__name__.endswith("Flipout")
                   else "reparameterization")
        if estimators is not None and est not in estimators:
            continue
        is_conv = getattr(layer, "mu_kernel", None) is not None
        is_lin = getattr(layer, "mu_weight", None) is not None
        if not (is_conv or is_lin) or getattr(layer, "quant_prepare",
                                              False):
            continue
        mu = layer.mu_kernel[...] if is_conv else layer.mu_weight[...]
        rho = layer.rho_kernel[...] if is_conv else layer.rho_weight[...]
        sigma = sigma_from_rho(rho)
        if est == "flipout":
            mu = jnp.zeros_like(mu)  # flipout presamples delta = sigma*eps
        if is_conv and not getattr(layer, "transposed", False) \
                and mu.ndim > 2:
            nd = mu.ndim - 2
            perm = tuple(range(2, 2 + nd)) + (0, 1)  # (O,I,*k)->(*k,O,I)
            inv = (nd, nd + 1) + tuple(range(nd))
            mu = jnp.transpose(mu, perm)
            sigma = jnp.transpose(sigma, perm)
        else:
            inv = None
        entries.append((layer, est, mu.shape, inv, mu.size))
        mus.append(mu.reshape(-1))
        sigmas.append(sigma.reshape(-1))
        if key is None:
            key = layer.rngs.noise()
    if not entries:
        return []

    out_dtype = entries[0][0].compute_dtype or mus[0].dtype
    w_all = sample_scaled_normals_batch(
        key, jnp.concatenate(mus), jnp.concatenate(sigmas), num_mc,
        out_dtype)

    touched = []
    off = 0
    import jax as _jax
    for layer, est, t_shape, inv, n in entries:
        w = w_all[:, off:off + n].reshape((num_mc,) + t_shape)
        if inv is not None:
            w = jnp.transpose(w, (0,) + tuple(i + 1 for i in inv))
        layer._presampled_w = Presampled(w)
        off += n
        attrs = ["_presampled_w"]
        if layer.mu_bias is not None:
            kb = layer.rngs.noise()
            eps_b = _jax.random.normal(kb, (num_mc,) + layer.mu_bias.shape)
            sigma_b = sigma_from_rho(layer.rho_bias[...])
            if est == "flipout":
                b = sigma_b * eps_b  # mean bias rides the mu path
            else:
                b = layer.mu_bias[...] + sigma_b * eps_b
            layer._presampled_b = Presampled(b)
            attrs.append("_presampled_b")
        touched.append((layer, attrs))
    return touched


def _presample_layers_xla(model, num_mc, estimators=None,
                          flipout_eps=False, generator="rbg"):
    """Draw all layers' per-draw weights with plain XLA rbg normals and
    attach them as Presampled variables — behind a
    ``lax.optimization_barrier``. ``estimators`` optionally restricts
    which estimator kinds are presampled (the scan emission passes
    ("reparameterization",): presampling the flipout delta kernel
    forces the layer off its fused dual-conv/iota-signs fast path and
    measured 513 vs 257 ms on the flipout flagship — flipout samples
    in-body there).

    THE BARRIER IS THE POINT: when the mu+sigma*eps weight
    materialization stays fusable, XLA can fold it into every conv's
    weight feed and the vmapped convs run ~30% slower than the same
    convs consuming materialized weights (hand-rolled layer3 microcosm:
    18.9 ms in-graph vs 14.1 ms weights-as-arguments vs det 14.5; the
    barrier alone recovers it: 14.46 ms). Scale-dependence, measured
    round 4: at 3-Bottleneck library-class scale the barrier recovers
    19.2 -> 17.3 ms (det 13.1); at FULL flagship scale it is NEUTRAL —
    the RN50 HLO already materializes the sampled weights in separate
    fusions (all 54 conv weight feeds are pure relayouts either way),
    so this mode is opt-in, mainly useful for small/medium models where
    XLA chooses to inline the sampling.

    Same per-forward-redraw semantics as the in-vmap path: fresh draws
    every call, one (num_mc, ...) normal per layer from its own noise
    stream. reparam layers get W_s = mu + sigma*eps_s; flipout layers
    get delta_s = sigma*eps_s (their mean path reads mu directly).
    """
    from bayesian_torch_tpu.layers.base_variational_layer import Presampled
    from bayesian_torch_tpu.models.dnn_to_bnn import iter_bayesian_layers
    from bayesian_torch_tpu.ops.sampling import (normal_fused,
                                                 sigma_from_rho,
                                                 squeezed_shape)

    if generator == "hash":
        # counter-hash Box-Muller (ops/sampling.normal_fused): full-f32
        # N(0,1) quality from 24-bit uniforms, ~5.9-sigma tails, pure
        # elementwise — measured 9.2 vs 13.1 ms isolated at RN50 MC-10
        # against the rbg+erfinv path (doc/PROFILE_r05.md)
        def _normal(key, shape, dtype=jnp.float32):
            return normal_fused(key, shape, dtype)
    else:
        _normal = jax.random.normal

    entries = []
    tensors = []
    qentries = []  # quantized layers: (layer, w_q (S,..), scale, b|None)
    for layer in iter_bayesian_layers(model):
        est = getattr(layer, "estimator", None)
        if est is None:
            est = ("flipout" if type(layer).__name__.endswith("Flipout")
                   else "reparameterization")
        if estimators is not None and est not in estimators:
            continue
        if (getattr(layer, "quantized_mu_weight", None) is not None
                and est == "reparameterization"
                and getattr(layer, "_frozen_w", None) is None):
            # INT8 layer: presample the quantized weight BUILD (eps
            # draw + quantize + qmul + qadd) for all S draws at once —
            # the build is the measured INT8 bottleneck
            # (benchmarks/int8_analysis.py) and runs serially inside
            # the scan body otherwise. normal_scale matches the
            # forward default (reference quantize_linear_variational
            # .py:202-219; unused on the calibrated quant_dict path).
            kshape = layer.quantized_mu_weight.shape
            ks = squeezed_shape(kshape)
            eps = _normal(layer.rngs.noise(),
                          (num_mc,) + ks).reshape((num_mc,) + kshape)
            eps_b = None
            if getattr(layer, "quantized_sigma_bias", None) is not None:
                eps_b = _normal(
                    layer.rngs.noise(),
                    (num_mc,) + layer.quantized_mu_bias.shape)
            w_q, w_scale, bias = layer._sampled_qweight_reparam(
                6 / 255, eps=eps, eps_b=eps_b)
            if eps_b is None:
                bias = None  # draw-invariant; layer re-derives it
            # uncalibrated builds bake normal_scale into the int8 grid;
            # the layer only consumes the presample when its call-time
            # normal_scale matches this (quantized_base._forward_reparam)
            layer._presampled_qnscale = 6 / 255
            qentries.append((layer, w_q, w_scale, bias))
            continue
        is_conv = getattr(layer, "mu_kernel", None) is not None
        is_lin = getattr(layer, "mu_weight", None) is not None
        if not (is_conv or is_lin) or getattr(layer, "quant_prepare",
                                              False):
            continue
        mu = layer.mu_kernel[...] if is_conv else layer.mu_weight[...]
        rho = layer.rho_kernel[...] if is_conv else layer.rho_weight[...]
        sigma = sigma_from_rho(rho)
        dtype = layer.compute_dtype or mu.dtype
        ks = squeezed_shape(mu.shape)  # 1x1-kernel generation-shape fix
        if est == "flipout" and flipout_eps:
            # presample RAW eps only (in the compute dtype, matching the
            # in-body draw at flipout_conv/linear: ops/conv.py:462-463):
            # the layer's fast path (fused dual conv + iota signs) stays
            # intact and builds delta = sigma*eps in-body — presampling
            # DELTA instead forces the slow _presampled_w branch
            # (measured 513 vs 257 ms on the flipout flagship, round 4)
            eps = _normal(layer.rngs.noise(), (num_mc,) + ks,
                          dtype).reshape((num_mc,) + mu.shape)
            b = None
            if layer.mu_bias is not None:
                b = _normal(
                    layer.rngs.noise(),
                    (num_mc,) + layer.mu_bias.shape, dtype)
            entries.append((layer, b is not None, "eps"))
            tensors.append(eps)
            if b is not None:
                tensors.append(b)
            continue
        # generation AND algebra at the squeezed shape (identical
        # values, ~14x faster fusions at (S, O, I, 1, 1) shapes —
        # doc/PROFILE_r05.md; benchmarks/bench_r05_flagship.py variant j)
        eps = _normal(layer.rngs.noise(), (num_mc,) + ks)
        mu_s, sigma_s = mu.reshape(ks), sigma.reshape(ks)
        w = (sigma_s * eps if est == "flipout"
             else mu_s + sigma_s * eps).astype(dtype).reshape(
                 (num_mc,) + mu.shape)
        b = None
        if layer.mu_bias is not None:
            eps_b = _normal(layer.rngs.noise(),
                                      (num_mc,) + layer.mu_bias.shape)
            sigma_b = sigma_from_rho(layer.rho_bias[...])
            b = (sigma_b * eps_b if est == "flipout"
                 else layer.mu_bias[...] + sigma_b * eps_b)
        entries.append((layer, b is not None, "w"))
        tensors.append(w)
        if b is not None:
            tensors.append(b)
    if not entries and not qentries:
        return []
    qt = []
    for _, w_q, _, bias in qentries:
        qt.append(w_q)
        if bias is not None:
            qt.append(bias)
    tensors = jax.lax.optimization_barrier(tensors + qt)
    it = iter(tensors)
    touched = []
    for layer, has_b, kind in entries:
        w_attr = "_presampled_w" if kind == "w" else "_presampled_eps"
        b_attr = "_presampled_b" if kind == "w" else "_presampled_eps_b"
        setattr(layer, w_attr, Presampled(next(it)))
        attrs = [w_attr]
        if has_b:
            setattr(layer, b_attr, Presampled(next(it)))
            attrs.append(b_attr)
        touched.append((layer, attrs))
    for layer, _, w_scale, bias in qentries:
        layer._presampled_qw = Presampled(next(it))
        if not isinstance(w_scale, float):
            # rare fallback (restored ckpt without static scales): keep
            # the traced scalar in mapped state, one copy per draw
            w_scale = Presampled(jnp.broadcast_to(w_scale, (num_mc,)))
        layer._presampled_qscale = w_scale
        attrs = ["_presampled_qw", "_presampled_qscale",
                 "_presampled_qnscale"]
        if bias is not None:
            layer._presampled_qbias = Presampled(next(it))
            attrs.append("_presampled_qbias")
        touched.append((layer, attrs))
    return touched


# auto-emission size heuristic (ADVICE r4): scan serializes draws, so it
# only wins when one draw's work fills the chip. Proxy for per-draw work:
# batch_size x total-Bayesian-param-count. Measured anchors (v5e):
# LSTM bs128 x 66k params = 8.4e6 -> vmap wins 6.7x (1.43 vs 9.63 ms);
# CIFAR RN20 bs1000 x 0.27M = 2.7e8 -> scan wins (54.3 vs 86.1 ms);
# RN50 bs128 x 25.5M = 3.3e9 -> scan wins (105.7 vs 134.8 ms).
# Threshold sits a decade above the measured loser and a decade below
# the smallest measured winner.
_SCAN_MIN_WORK = 3e7


def _resolve_emission(model, x, num_mc, mesh, structured):
    """Resolve emission='auto' to the measured-optimal emission.

    vmap when: a mesh is given (scan serializes draws — an 'mc' axis
    gains nothing under it), the structured path was requested,
    num_mc <= 1, any module is in training mode (BN EMA is vmap-shaped;
    for FROZEN-BN training, scan ties vmap on reparam (207.4 vs
    208.4 ms MC4 bs128) and beats it on flipout (409.9 vs 461.3) —
    pass emission="scan" explicitly for that opt-in fine-tuning mode,
    auto stays conservative because scan training relies on remat),
    or the per-draw work is too small to amortize a sequential loop
    (see _SCAN_MIN_WORK). scan otherwise — the measured single-chip
    inference optimum (doc/PROFILE_r04.md).
    """
    if mesh is not None or structured or num_mc <= 1:
        return "vmap"
    n_params = 0
    for _, mod in nnx.iter_modules(model):
        if getattr(mod, "training", False):
            return "vmap"
        for attr in ("mu_kernel", "mu_weight", "quantized_mu_weight"):
            v = getattr(mod, attr, None)
            if v is not None:
                n_params += v.size
    batch = x.shape[0] if getattr(x, "ndim", 0) else 1
    if batch * n_params < _SCAN_MIN_WORK:
        return "vmap"
    return "scan"


def _forward_out_shapedtype(model, x):
    """Abstract (shape, dtype) of one forward's output (no FLOPs)."""
    graphdef, state = nnx.split(model)

    def f(state, x):
        out = nnx.merge(graphdef, state)(x)
        return out[0] if isinstance(out, tuple) else out

    return jax.eval_shape(f, state, x)


def _reshard_mc(result, mesh, return_kl):
    """Constraint-reshard a (outs, kl)|outs result's MC/batch axes onto
    the mesh (shared by the scan/structured/vmapped returns)."""
    if mesh is None:
        return result
    outs = result[0] if return_kl else result
    outs = jax.lax.with_sharding_constraint(
        outs, NamedSharding(mesh, P("mc", "data")))
    return (outs, result[1]) if return_kl else outs


def _mc_forward_structured(model, x, num_mc, return_kl):
    """Explicit channel-tiled MC axis (no vmap): every layer sees
    (B, *sp, S*C) with draw s in channel block s. Built for Flipout
    inference, where vmap's batching-dim normalization forces the
    per-draw convs into a slow (mc, B, ...) form and adds activation
    transposes around every sign multiply (doc/PROFILE_r03.md). All
    convs here are feature_group_count=S grouped convs in the fast
    (B, *sp, S, C) form, and the sign hashes are generated directly in
    that order. Training works too: BatchNorm computes per-draw-block
    batch stats from the (..., S, C) reshape and applies one EMA update
    from the draw-averaged stats (same semantics as bn_stats="ema" on
    the vmapped path; layers/batchnorm.py structured branch)."""
    flagged = []
    try:
        for _, mod in nnx.iter_modules(model):
            mod._mc_structured = num_mc
            flagged.append(mod)
        out = model(x)
    finally:
        for mod in flagged:
            del mod._mc_structured
    out, kl = out if isinstance(out, tuple) else (out, 0.0)
    k = out.shape[-1] // num_mc
    out = out.reshape(out.shape[:-1] + (num_mc, k))
    outs = jnp.moveaxis(out, -2, 0)  # (S, B, ..., K)
    if return_kl:
        return outs, jnp.asarray(kl)
    return outs


def _mc_forward_scan(model, x, num_mc, return_kl, unroll=1, remat=True,
                     presample="xla", reduce=None, remat_policy=None):
    """``lax.scan`` over the draw axis: each iteration runs the plain
    4-D det-form forward with that draw's noise stream.

    Why this emission exists (round 4, doc/PROFILE_r04.md): the vmapped
    MC forward pays (i) cross-draw weight relayout fusions (a
    (10,1024,512,1,1) sampled kernel relayouts at ~23 GB/s) and (ii) a
    5-D conv-emitter tiling spread — neither a raw-conv form tax nor
    sampling FLOPs. Scanning the draw axis gives XLA exactly the
    deterministic model's HLO per iteration (same fusion forms as the
    10x-det denominator), with per-draw weights built inside the body.
    The loop serializes draws, which is free when one draw's batch
    already fills the chip (bs>=128 RN50).

    Eval-only: BN running-stat EMA updates under a scanned draw axis
    would need carried stats; training keeps the vmapped path.

    Key-derivation note: both emissions split the 'noise' stream
    ``num_mc`` ways (nnx.split_rngs), but the scan carries the RngCount
    across iterations, so only draw 0 is bit-identical to the vmapped
    draw 0; later draws consume the same split keys at different
    fold-in counts — independent, valid draws (tests/test_mc_scan.py).

    Mesh note: the draw loop is sequential, so a 'mc' mesh axis gains
    nothing here — each iteration is batch-sharded over 'data' and the
    stacked output is then constraint-resharded to ('mc','data') for
    API parity. Multi-chip MC parallelism wants the vmapped emission.

    ``presample="xla"`` (default) draws every REPARAMETERIZATION
    layer's (S, ...) weights OUTSIDE the loop (plain XLA rbg normals
    behind an optimization_barrier, _presample_layers_xla) and scans
    the Presampled axis; the body is then the pure det-form forward.
    Measured on the flagship (benchmarks/bench_scan_presample.py,
    RN50 MC-10 bs128): 113.26 ms in-body -> 105.31 ms presampled —
    the residual over the 10x-det-bs128 floor (~96-98 ms) is the rbg
    sampling cost (4.6 ms at current toolchain) + loop overhead.
    Costs S x params of HBM (510 MB at RN50 MC-10); pass
    presample="off" to sample inside the body. Flipout layers always
    sample in-body: presampling the delta kernel forces them off the
    fused dual-conv/iota-signs fast path (measured 513 vs 257 ms).
    """
    from bayesian_torch_tpu.layers.base_variational_layer import Presampled

    for _, mod in nnx.iter_modules(model):
        if getattr(mod, "training", False) and getattr(
                mod, "track_running_stats", False):
            raise NotImplementedError(
                "mc_forward(emission='scan') is eval-only: BN "
                "running-stat updates under a scanned draw axis are "
                "not supported (use the vmapped path for training)")
    acc0 = None
    if reduce == "mean":
        # predictive-mean accumulator: probe the forward's output shape
        # abstractly BEFORE presampling attaches (S, ...) variables.
        out_sd = _forward_out_shapedtype(model, x)
        acc0 = jnp.zeros(out_sd.shape, jnp.float32)
    presampled = []
    if presample in ("xla", "hash") and num_mc > 1:
        # reparam layers: full (S, ...) weight draws outside the loop;
        # flipout layers: RAW eps only (delta stays in the fused
        # in-body path); quantized reparam layers: the full quantized
        # weight build. generator="hash" swaps rbg+erfinv for the
        # counter-hash Box-Muller (normal_fused) — same f32 N(0,1)
        # quality, measured cheaper (doc/PROFILE_r05.md).
        presampled = _presample_layers_xla(
            model, num_mc, estimators=("reparameterization", "flipout"),
            flipout_eps=True,
            generator="hash" if presample == "hash" else "rbg")
    elif presample == "on" and num_mc > 1:
        # Pallas K1 batch sampler for the reparam weight draws (full
        # f32 Box-Muller quality on the hardware PRNG); flipout keeps
        # the xla raw-eps presample (the sampler emits scaled draws)
        presampled = _presample_layers(
            model, num_mc, estimators=("reparameterization",))
        presampled += _presample_layers_xla(
            model, num_mc, estimators=("flipout",), flipout_eps=True)
    state_axes = nnx.StateAxes({"noise": 0, Presampled: 0, ...: None})

    if reduce == "mean":
        # Accumulate the predictive mean in the scan carry instead of
        # stacking a (num_mc, B, ...) output (VERDICT r4 #1b: the
        # stacked output costs a per-iteration dynamic-update-slice +
        # a post-loop reshard the mean consumer immediately reduces
        # away). Output shape (B, ...); KL is draw-invariant, so the
        # last iteration's scalar is THE value.
        def _body(model, carry):
            x, acc = carry
            out = model(x)
            if not isinstance(out, tuple):
                out = (out, jnp.asarray(0.0))
            acc = acc + out[0].astype(acc.dtype) / num_mc
            return (x, acc), jnp.asarray(out[1], jnp.float32)
    else:
        def _body(model, x):
            out = model(x)
            if not isinstance(out, tuple):
                out = (out, jnp.asarray(0.0))
            return x, (out[0], jnp.asarray(out[1], jnp.float32))

    if remat:
        # Differentiating through the scan would otherwise save every
        # draw's full activation set (RN50 MC-4 bs128: 28 GB > HBM);
        # remat re-runs each draw's forward in its backward instead —
        # the standard scan-over-layers recipe. Free for eval (remat
        # only changes the VJP; the primal HLO is identical).
        # ``remat_policy`` selects a SELECTIVE checkpoint policy (e.g.
        # jax.checkpoint_policies.save_only_these_names('conv_out'):
        # conv outputs are checkpoint_name'd in ops/conv.py, so the
        # backward recomputes only the cheap BN/ReLU/add elementwise
        # between convs instead of re-running each draw's full forward).
        _body = nnx.remat(_body, policy=remat_policy)

    _run = nnx.split_rngs(splits=num_mc, only="noise")(
        nnx.scan(_body, in_axes=(state_axes, nnx.Carry),
                 out_axes=(nnx.Carry, 0), unroll=unroll))

    try:
        if reduce == "mean":
            (_, outs), kls = _run(model, (x, acc0))
        else:
            _, (outs, kls) = _run(model, x)
    finally:
        for layer, attrs in presampled:
            for a in attrs:
                delattr(layer, a)
    if return_kl:
        kl = kls[0] if getattr(kls, "ndim", 0) > 0 else kls
        return outs, kl
    return outs


def mc_forward(model: nnx.Module, x, num_mc: int, *,
               mesh: Optional[Mesh] = None, return_kl: bool = True,
               compute_kl: Optional[bool] = None,
               presample: str = "auto", bn_stats: str = "ema",
               structured: bool = False, emission: str = "auto",
               reduce: Optional[str] = None, remat_policy=None):
    """Run ``num_mc`` stochastic forwards as one compiled computation.

    Returns ``(outputs, kl)`` with outputs stacked on a leading MC axis
    (shape (num_mc, ...)). When ``mesh`` is given, the MC axis is
    sharding-constrained to the mesh's 'mc' axis and the batch dim to
    'data', so the samples are computed on different chips.

    ``emission`` selects how the MC axis is compiled:

    - ``"auto"`` (default): the measured optimum — "scan" for
      large-workload single-chip inference, "vmap" whenever a mesh or
      the structured path is requested, any module is in training mode,
      num_mc <= 1, or the per-draw work is too small to amortize a
      sequential loop (batch x Bayesian-params < 3e7; the MC-20 LSTM
      measured 6.7x slower scanned). See _resolve_emission.
    - ``"vmap"``: one vmapped program — ten draws cost like a
      10x batch. The right form for training (BN EMA) and for sharding
      the MC axis over a mesh.
    - ``"scan"``: ``lax.scan`` over the draw axis; each iteration runs
      the model's plain det-form HLO. The fastest single-chip
      *inference* emission (RN50 MC-10 bs128: 949.7 -> 1211 imgs/s).
      Eval-only — falls back to vmap with a RuntimeWarning on
      training-mode BN (frozen/eval BN trains fine through it).

    ``reduce="mean"`` returns the predictive mean over draws (shape
    (batch, ...)) instead of the stacked (num_mc, ...) outputs. Under
    the scan emission the mean accumulates in the loop carry, skipping
    the stacked-output materialization entirely — the cheapest form
    when only the MC average is consumed (the evaluate() path).

    ``remat_policy`` (scan emission only) selects a selective
    checkpoint policy for the scan body's VJP, e.g.
    ``jax.checkpoint_policies.save_only_these_names('conv_out')`` keeps
    every conv output (named in ops/conv.py) and recomputes only the
    BN/ReLU/add elementwise between them in the backward — the
    middle ground between full remat (re-run each draw's forward) and
    no remat (save all draws' activations, OOM at RN50 MC-4 bs128).

    ``structured=True`` (Flipout inference/training) carries the MC
    axis as channel blocks instead of vmapping — see
    _mc_forward_structured; falls back to vmap with a warning where
    unsupported.

    ``presample`` controls where weight draws happen: ``"auto"``
    resolves to "off" for the vmapped emission and "xla" (draws outside
    the loop, det-form body) for the scan emission — both the measured
    optima; "on" routes through the Pallas batch sampler (K1,
    measured slower at flagship shapes — kept for evidence).

    Note the KL term is a function of parameters only, so it is the
    same scalar for every draw; it is returned unstacked. Pass
    ``return_kl=False`` (pure inference) to also skip evaluating the
    closed-form KL entirely; ``compute_kl`` overrides that linkage.

    ``bn_stats`` controls BatchNorm running statistics when
    ``num_mc > 1`` in training mode (running-stat writes inside the
    vmap are ill-defined: the stats are broadcast state):

    - ``"ema"`` (default): every draw records its batch (mean, var)
      into an MC-mapped accumulator; after the vmap the draws are
      averaged and ONE standard EMA update is applied. Same momentum
      semantics as a plain forward, lower-variance statistics, and no
      extra forward pass (the reference's MC loop updates stats once
      per model call, main_bayesian_mnist.py:27-32).
    - ``"freeze"``: leave running stats untouched (round-1 behavior;
      callers then refresh stats themselves).
    """
    if emission not in ("auto", "vmap", "scan"):
        raise ValueError(
            f"mc_forward: unknown emission {emission!r} "
            "(expected 'auto', 'vmap' or 'scan')")
    if reduce not in (None, "mean"):
        raise ValueError(
            f"mc_forward: unknown reduce {reduce!r} "
            "(expected None or 'mean')")
    if presample not in ("auto", "off", "on", "xla", "hash"):
        raise ValueError(
            f"mc_forward: unknown presample {presample!r} "
            "(expected 'auto', 'off', 'on', 'xla' or 'hash')")
    if emission == "auto":
        emission = _resolve_emission(model, x, num_mc, mesh, structured)
    if compute_kl is None:
        compute_kl = return_kl
    kl_off = []
    if not compute_kl:
        for _, mod in nnx.iter_modules(model):
            if getattr(mod, "compute_kl", None) is True:
                mod.compute_kl = False
                kl_off.append(mod)
    # NOTE: presample routes weight draws through the fused Pallas batch
    # sampler (ops/pallas/sampled_weights.py). Measured end-to-end it
    # LOSES to the XLA path on conv models and always will: the
    # flagship's total in-vmap sampling overhead is ~0.9 ms/step (XLA
    # fuses rbg bits + mu+sigma*eps directly into each conv's weight
    # materialization), below the batch sampler's 5.4 ms kernel time
    # alone. The sampler only beats XLA under threefry keys (13.1 vs
    # 11.1 ms for 10x25.5M draws); with the recommended rbg keys XLA
    # wins (7.4 ms). See ROADMAP.md "presample" entry for the full
    # measurement trail. Default "auto":
    # - vmapped emission -> OFF: the measured conclusion above holds
    #   for every conv model tried; the Pallas sampler is
    #   explicit-opt-in only.
    # - scan emission -> "xla": drawing all (S, ...) weights outside
    #   the loop makes the body the pure det-form forward (measured
    #   113.26 -> 105.31 ms on the flagship, _mc_forward_scan notes).
    #
    # presample="xla" (round 4) is a DIFFERENT animal: plain XLA
    # normals drawn outside the vmap/scan behind an
    # optimization_barrier — no Pallas, no flat buffer. The barrier
    # stops XLA fusing the weight materialization into every conv
    # (measured ~30% conv-time tax; _presample_layers_xla docstring
    # has the numbers).
    use_presample = presample == "on"
    presampled = []
    try:
        if emission == "scan" and num_mc > 1 and not structured:
            # 'on' routes the reparam weight draws through the Pallas
            # K1 batch sampler (round 5: its (S, ...) Presampled layout
            # is exactly what the scan consumes); 'hash' swaps the
            # generator for the counter-hash Box-Muller; 'auto' -> 'xla'
            scan_ps = (presample if presample in ("off", "on", "hash")
                       else "xla")
            try:
                result = _mc_forward_scan(model, x, num_mc, return_kl,
                                          presample=scan_ps,
                                          reduce=reduce,
                                          remat_policy=remat_policy)
            except NotImplementedError as e:
                # training-mode BN: fall back to the vmapped path (same
                # math, EMA-capable emission) — logged, not silent,
                # like the structured fallback below.
                import warnings

                warnings.warn(
                    f"mc_forward(emission='scan') fell back to the "
                    f"vmapped path: {e}", RuntimeWarning, stacklevel=2)
                result = None
            if result is not None:
                if reduce is not None:
                    # (B, ...) mean: no MC axis, but the batch axis
                    # keeps the mesh 'data' contract
                    if mesh is not None:
                        outs = result[0] if return_kl else result
                        outs = jax.lax.with_sharding_constraint(
                            outs, NamedSharding(mesh, P("data")))
                        result = ((outs, result[1]) if return_kl
                                  else outs)
                    return result
                return _reshard_mc(result, mesh, return_kl)
        if structured and num_mc > 1:
            try:
                result = _mc_forward_structured(model, x, num_mc,
                                                return_kl)
            except NotImplementedError as e:
                # a layer without structured support (transposed conv,
                # NCHW, ...): fall back to the vmapped path — same
                # math, different emission. Logged so a perf-sensitive
                # caller notices the emission change (VERDICT r3 #3).
                import warnings

                warnings.warn(
                    f"mc_forward(structured=True) fell back to the "
                    f"vmapped path: {e}", RuntimeWarning, stacklevel=2)
                result = None
            if result is not None:
                result = _reshard_mc(result, mesh, return_kl)
                return _reduce_mc(result, reduce, return_kl)
        if presample in ("xla", "hash") and num_mc > 1:
            presampled = _presample_layers_xla(
                model, num_mc,
                generator="hash" if presample == "hash" else "rbg")
        elif use_presample:
            presampled = _presample_layers(model, num_mc)
        result = _mc_forward_inner(model, x, num_mc, mesh, return_kl,
                                   bn_stats)
        return _reduce_mc(result, reduce, return_kl)
    finally:
        for layer, attrs in presampled:
            for a in attrs:
                delattr(layer, a)
        for mod in kl_off:
            mod.compute_kl = True


def _reduce_mc(result, reduce, return_kl):
    """Apply reduce='mean' over the leading MC axis of a stacked
    result (the scan emission reduces in-carry instead)."""
    if reduce is None:
        return result
    outs = result[0] if return_kl else result
    outs = outs.astype(jnp.float32).mean(axis=0)
    return (outs, result[1]) if return_kl else outs


def _apply_bn_ema(mod):
    """Average the collected per-draw batch stats and apply one EMA
    update (identical factor semantics to the in-layer path)."""
    stats = mod._mc_stats[...]  # (num_mc, 2, C)
    mean = stats[:, 0].mean(axis=0)
    unbiased_var = stats[:, 1].mean(axis=0)
    mod.num_batches_tracked[...] = mod.num_batches_tracked[...] + 1
    if mod.momentum is None:
        factor = 1.0 / mod.num_batches_tracked[...].astype(jnp.float32)
    else:
        factor = mod.momentum
    mod.running_mean[...] = ((1 - factor) * mod.running_mean[...]
                             + factor * mean)
    mod.running_var[...] = ((1 - factor) * mod.running_var[...]
                            + factor * unbiased_var)


def _mc_forward_inner(model, x, num_mc, mesh, return_kl, bn_stats="ema"):
    if num_mc == 1:
        # plain forward (exact reference semantics incl. BN stat updates)
        out = model(x)
        out, kl_single = out if isinstance(out, tuple) else (out, 0.0)
        outs = jax.tree.map(lambda o: o[None], out)
        kls = jnp.asarray(kl_single)[None] if hasattr(
            kl_single, "ndim") else jnp.asarray([kl_single])
    else:
        from bayesian_torch_tpu.layers.base_variational_layer import (
            Presampled,
        )
        from bayesian_torch_tpu.layers.batchnorm import MCBatchStats
        state_axes = nnx.StateAxes({"noise": 0, Presampled: 0,
                                    MCBatchStats: 0, ...: None})

        @nnx.split_rngs(splits=num_mc, only="noise")
        @nnx.vmap(in_axes=(state_axes, None), out_axes=0)
        def _run(model, x):
            out = model(x)
            if isinstance(out, tuple):
                return out
            return out, 0.0

        # Freeze BN running-stat writes during the vmapped run: mutating
        # broadcast state under vmap is ill-defined. Batch statistics are
        # still used for normalization in training mode. (This is a
        # static trace-time toggle.) With bn_stats="ema", each draw
        # instead records its batch stats into an MC-mapped accumulator
        # and one EMA update is applied after the vmap.
        frozen = []
        collecting = []
        for _, mod in nnx.iter_modules(model):
            if getattr(mod, "stats_frozen", None) is False:
                mod.stats_frozen = True
                frozen.append(mod)
                if (bn_stats == "ema" and mod.training
                        and mod.track_running_stats):
                    mod._mc_stats = MCBatchStats(
                        jnp.zeros((num_mc, 2, mod.num_features),
                                  jnp.float32))
                    collecting.append(mod)
        try:
            outs, kls = _run(model, x)
            for mod in collecting:
                _apply_bn_ema(mod)
        finally:
            for mod in frozen:
                mod.stats_frozen = False
            for mod in collecting:
                del mod._mc_stats
    if mesh is not None:
        outs = jax.lax.with_sharding_constraint(
            outs, NamedSharding(mesh, P("mc", "data")))
    if return_kl:
        kl = kls[0] if getattr(kls, "ndim", 0) > 0 else kls
        return outs, kl
    return outs
