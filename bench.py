"""Flagship benchmark: Bayesian ResNet-50 on TPU — inference + training.

Headline metric: images/sec/chip through the 10-MC-sample Bayesian
ResNet-50, best MC emission (vmapped MC axis vs the round-4
scan-over-draws emission — the JSON carries which won and the vmap
number). vs_baseline: ratio against the "10x
deterministic forward" cost model from BASELINE.json — the cost of
running the deterministic ResNet-50 on 10 copies of each image at its
FASTEST measured configuration (min of one bs=1280 batched forward and
10x the bs=128 step — bs128 is faster per image, round 4), in the SAME
precision (bf16) and layout (value 1.0 = Bayesian sampling is free;
north-star target >= 0.9). Round 3 made the deterministic denominator
honest on precision (nn modules silently ran fp32 convs in rounds 1-2,
flattering the ratio); round 4 made it honest on batch shape.

The ONE JSON line also carries (VERDICT r2 items 1-3):
- sol_bayes / sol_det: absolute %-of-bf16-speed-of-light;
- flipout_ips and flipout_vs_2x_reparam: Flipout RN50 MC-10 against
  the equal-structure bound (reparam step x2 — Flipout runs 2x the
  conv FLOPs of reparam at the same MC/batch/layout structure);
- train_*: ELBO train-step metrics (det / MC=1 / MC=4) at the batch
  size the sweep found best, with %SoL on 3x-forward FLOPs.

Measurement notes (this environment):
- the tunneled TPU backend does NOT block in jax.block_until_ready, and
  scalar fetches carry hundreds of ms of tunnel latency, so step time is
  measured as a slope: (t(N2 steps) - t(N1 steps)) / (N2 - N1) with a
  single scalar fetch per run;
- functions are jax.jit over nnx-split state (nnx.jit's Python
  graph-walk overhead would otherwise dominate);
- inputs are random, not ones (XLA constant-folds all-ones convs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax

# persistent compile cache: the MC10 ResNet-50 HLO takes minutes to
# compile cold; warm runs load from cache in seconds
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402

BATCH = 128  # bs sweep (round 2, NHWC): 64->632 ips, 96->597, 128->948
TRAIN_BATCH = 128  # round-3 sweep: see BASELINE.md training table
NUM_MC = 10
IMG = 224
N1, N2 = 3, 13
COMPUTE_DTYPE = jnp.bfloat16

# ResNet-50 @224 forward: 2*MACs for convs+fc (torchvision profile);
# used for the speed-of-light fraction when XLA cost analysis is
# unavailable on the tunneled backend.
RESNET50_FLOPS_PER_IMG = 2 * 4.089e9


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _set_compute_dtype(model, dtype):
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = dtype


def _step_time(fn, *args):
    """Median-of-3 slope-method step time for an enqueued jitted fn that
    returns a scalar."""
    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            r = fn(*args)
        float(r)  # single blocking fetch
        return time.perf_counter() - t0

    run(2)  # compile + warm
    ts = []
    for _ in range(3):
        t_small = run(N1)
        t_big = run(N2)
        ts.append((t_big - t_small) / (N2 - N1))
    ts.sort()
    return ts[1]


def _slope_once(fn, *args):
    """One slope measurement (callers interleave and median themselves —
    the VERDICT r4 noise discipline for the headline ratio)."""
    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            r = fn(*args)
        float(r)
        return time.perf_counter() - t0

    return (run(N2) - run(N1)) / (N2 - N1)


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def _build_bayes(kind, data_format, emission="vmap"):
    from bayesian_torch_tpu.parallel import mc_forward

    if kind == "flipout":
        from bayesian_torch_tpu.models.bayesian.resnet_flipout_large \
            import resnet50
    else:
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
    # rbg noise keys: the TPU-native PRNG shaves threefry time off the
    # per-draw weight sampling
    model = resnet50(rngs=nnx.Rngs(
        params=jax.random.key(0),
        noise=jax.random.key(1, impl="rbg")), data_format=data_format)
    model.eval()
    _set_compute_dtype(model, COMPUTE_DTYPE)
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, x):
        model = nnx.merge(graphdef, state)
        return mc_forward(model, x, NUM_MC, return_kl=False,
                          emission=emission).mean()

    return fwd, state


def _shape(data_format, batch):
    return ((batch, 3, IMG, IMG) if data_format == "NCHW"
            else (batch, IMG, IMG, 3))


def _build_det(data_format):
    from bayesian_torch_tpu.models.deterministic.resnet_large import (
        resnet50 as det_resnet50,
    )

    det = det_resnet50(rngs=nnx.Rngs(params=0, noise=1),
                       data_format=data_format)
    det.eval()
    _set_compute_dtype(det, COMPUTE_DTYPE)
    det_graphdef, det_state = nnx.split(det)

    @jax.jit
    def det_fwd(state, x):
        model = nnx.merge(det_graphdef, state)
        return model(x).mean()

    return det_fwd, det_state


def _measure_pair(data_format):
    """(bayes_step_time, det_10x_time) for one layout.

    The 10x-deterministic denominator is the TIGHTEST honest bound:
    min(one bs=1280 batched forward, 10 x the bs=128 step). Round-4
    discovery: the det RN50 forward is faster PER IMAGE at bs128
    (9.81 ms, 13,042 imgs/s) than at bs1280 (109.9 ms, 11,646 imgs/s),
    so "perfectly batched" bs1280 — the round 1-3 denominator — was
    not the strictest cost model (benchmarks/bench_scan_presample.py).
    """
    x = jax.random.normal(jax.random.key(42), _shape(data_format, BATCH),
                          jnp.float32)
    fwd, state = _build_bayes("bayes", data_format)
    t_bayes = _step_time(fwd, state, x)
    _log(f"bayes {data_format}: {t_bayes * 1e3:.2f} ms")

    det_fwd, det_state = _build_det(data_format)
    x_big = jax.random.normal(jax.random.key(43),
                              _shape(data_format, BATCH * NUM_MC),
                              jnp.float32)
    t_det_big = _step_time(det_fwd, det_state, x_big)
    t_det_small = _step_time(det_fwd, det_state, x)
    _log(f"det {data_format}: bs{BATCH * NUM_MC} {t_det_big * 1e3:.2f} ms"
         f" / bs{BATCH} x{NUM_MC} {NUM_MC * t_det_small * 1e3:.2f} ms")
    return t_bayes, min(t_det_big, NUM_MC * t_det_small)


def _measure_flipout(data_format):
    # two fast flipout emissions, best wins (round-4 numbers, bs128
    # NHWC: scan 257.2 ms / structured 288.8 / vmap 332.0):
    # - scan-over-draws: each draw runs the plain det-form flipout
    #   forward (benchmarks/bench_scan_more.py);
    # - structured (vmap-free, channel-tiled): fg=S grouped convs, no
    #   batching-dim transposes (ops/conv.py::flipout_conv_structured;
    #   exactness-tested in tests/test_structured_mc.py).
    from bayesian_torch_tpu.models.bayesian.resnet_flipout_large import (
        resnet50,
    )
    from bayesian_torch_tpu.parallel import mc_forward

    model = resnet50(rngs=nnx.Rngs(
        params=jax.random.key(0),
        noise=jax.random.key(1, impl="rbg")), data_format=data_format)
    model.eval()
    _set_compute_dtype(model, COMPUTE_DTYPE)
    graphdef, state = nnx.split(model)
    x = jax.random.normal(jax.random.key(42), _shape(data_format, BATCH),
                          jnp.float32)

    ts = {}
    for mode, kw in (("scan", dict(emission="scan")),
                     ("structured", dict(structured=True))):
        @jax.jit
        def fwd(state, x, kw=kw):
            model = nnx.merge(graphdef, state)
            return mc_forward(model, x, NUM_MC, return_kl=False,
                              **kw).mean()

        ts[mode] = _step_time(fwd, state, x)
        _log(f"flipout({mode}) {data_format}: {ts[mode] * 1e3:.2f} ms")
    return ts


def _measure_int8(data_format="NHWC"):
    """INT8 QBNN RN50 MC-1 step time, per-forward redraw and frozen-draw
    serving mode (driver-visible K4 numbers; see doc/quantization.md)."""
    from bayesian_torch_tpu.models.bayesian.\
        quantized_resnet_variational_large import qresnet50
    from bayesian_torch_tpu.quantization import freeze_quantized_draws

    q = qresnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                noise=jax.random.key(1, impl="rbg")),
                  fuse_conv_bn=True, data_format=data_format)
    x = jax.random.normal(jax.random.key(7), _shape(data_format, BATCH),
                          jnp.float32)

    def timed(model):
        gd, st = nnx.split(model)

        @jax.jit
        def fwd(st, x):
            out, _ = nnx.merge(gd, st)(x)
            return out.mean()

        return _step_time(fwd, st, x)

    t_redraw = timed(q)
    _log(f"int8 MC-1 bs{BATCH} {data_format}: {t_redraw * 1e3:.2f} ms")
    freeze_quantized_draws(q)
    t_frozen = timed(q)
    _log(f"int8 frozen-draw: {t_frozen * 1e3:.2f} ms")
    return t_redraw, t_frozen


def _measure_int8_mc10(data_format="NHWC"):
    """INT8 QBNN RN50 MC-10 (VERDICT r4 #3): scan emission at bs128
    (per-draw det-form int8 body, quantized weight builds presampled
    outside the loop) vs the round-3 vmapped form at bs32 (10 draws of
    uint8 activations exceed HBM at bs128 under vmap)."""
    from bayesian_torch_tpu.models.bayesian.\
        quantized_resnet_variational_large import qresnet50
    from bayesian_torch_tpu.parallel import mc_forward

    def timed(batch, emission):
        q = qresnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                    noise=jax.random.key(1, impl="rbg")),
                      fuse_conv_bn=True, data_format=data_format)
        gd, st = nnx.split(q)

        @jax.jit
        def fwd(st, x):
            m = nnx.merge(gd, st)
            return mc_forward(m, x, NUM_MC, return_kl=False,
                              emission=emission).astype(
                                  jnp.float32).mean()

        x = jax.random.normal(jax.random.key(7),
                              _shape(data_format, batch), jnp.float32)
        t = _step_time(fwd, st, x)
        _log(f"int8 MC-10 bs{batch} {emission}: {t * 1e3:.2f} ms "
             f"({batch / t:.1f} imgs/s)")
        return batch / t

    best_ips, best_cfg = 0.0, ""
    for batch, emission in ((BATCH, "scan"), (32, "vmap")):
        try:
            ips = timed(batch, emission)
        except Exception as e:  # noqa: BLE001 - OOM guard per config
            _log(f"int8 MC-10 bs{batch} {emission} failed: "
                 f"{type(e).__name__}")
            continue
        if ips > best_ips:
            best_ips, best_cfg = ips, f"{emission}-bs{batch}"
    if not best_cfg:
        # surface the failure through _soft's *_error field instead of
        # recording a silent 0.0 "throughput"
        raise RuntimeError("all int8 MC-10 configs failed (see stderr)")
    return {"int8_mc10_ips": round(best_ips, 2),
            "int8_mc10_config": best_cfg}


def _train_step_time(kind, batch, data_format="NHWC", frozen_bn=False):
    """ELBO train-step time (fwd+bwd+update, donated state)."""
    from bayesian_torch_tpu.parallel import mc_forward

    if kind == "det":
        from bayesian_torch_tpu.models.deterministic.resnet_large import (
            resnet50,
        )
        model = resnet50(rngs=nnx.Rngs(params=0, noise=1),
                         data_format=data_format)
    elif kind == "flipout_mc4":
        from bayesian_torch_tpu.models.bayesian.resnet_flipout_large \
            import resnet50
        model = resnet50(rngs=nnx.Rngs(
            params=jax.random.key(0),
            noise=jax.random.key(1, impl="rbg")), data_format=data_format)
    else:
        from bayesian_torch_tpu.models.bayesian.resnet_variational_large \
            import resnet50
        model = resnet50(rngs=nnx.Rngs(
            params=jax.random.key(0),
            noise=jax.random.key(1, impl="rbg")), data_format=data_format)
    num_mc = {"det": 0, "mc1": 1, "mc4": 4, "flipout_mc4": 4}[kind]
    model.train()
    if frozen_bn:
        from bayesian_torch_tpu.utils import freeze_batchnorm
        freeze_batchnorm(model)
    _set_compute_dtype(model, COMPUTE_DTYPE)
    opt = nnx.Optimizer(model, optax.sgd(0.01, 0.9), wrt=nnx.Param)
    gd, st = nnx.split((model, opt))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(st, x, y):
        model, opt = nnx.merge(gd, st)

        def loss_fn(model):
            if num_mc == 0:
                out = model(x)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    out.astype(jnp.float32), y).mean()
                return ce
            # flipout trains fastest through the structured
            # (vmap-free channel-tiled) path now that it supports
            # training-mode BN: 431.5 vs 502.1 ms vmapped at MC4 bs128
            # (round 4; reparam keeps vmap: 885 vs 957 ips structured)
            outs, kl = mc_forward(model, x, num_mc,
                                  structured=(kind == "flipout_mc4"))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                outs.mean(0).astype(jnp.float32), y).mean()
            return ce + kl / batch

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        _, st = nnx.split((model, opt))
        return loss, st

    x = jax.random.normal(jax.random.key(7), _shape(data_format, batch),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(8), (batch,), 0, 1000)

    box = [st]

    def wrapped():
        loss, box[0] = step(box[0], x, y)
        return loss

    t = _step_time(wrapped)
    tag = f"{kind}{'-frozenbn' if frozen_bn else ''}"
    _log(f"train {tag} bs{batch}: {t * 1e3:.2f} ms")
    return t


def _soft(extras, section, fn):
    """Run one auxiliary bench section; a failure must not cost the
    headline JSON line the driver records (fields are simply absent and
    the error is logged to stderr). Compiled-executable caches are
    dropped between sections (the persistent disk cache keeps reruns
    fast) — without this the accumulated executables' buffers pushed
    the late train sections into RESOURCE_EXHAUSTED once the int8 MC-10
    bs128 section joined the lineup."""
    try:
        extras.update(fn())
    except Exception as e:  # noqa: BLE001 - driver robustness by design
        _log(f"bench section '{section}' failed: {type(e).__name__}: {e}")
        extras[f"{section}_error"] = f"{type(e).__name__}: {e}"[:200]
    finally:
        jax.clear_caches()


def main():
    from bayesian_torch_tpu.utils.profiling import sol_fraction

    results = {}
    for df in ("NCHW", "NHWC"):
        results[df] = _measure_pair(df)

    # headline: the faster layout (same-layout det as denominator)
    layout = min(results, key=lambda d: results[d][0])
    t_vmap, t_det = results[layout]

    # scan-over-draws emission (round 4): each draw runs the plain
    # det-form forward under lax.scan — removes the vmap emission's
    # cross-draw weight relayouts and 5-D conv tiling spread
    # (doc/PROFILE_r04.md). Headline takes the faster emission.
    #
    # Noise discipline (VERDICT r4 #1c): the deciding numerator (scan)
    # and denominator (det bs128/bs1280) are measured in 3 ALTERNATING
    # rounds; the headline is the median and the JSON carries the
    # per-round ratio band, so a claim near the 0.90 line is backed by
    # its observed spread rather than a single coin-flip pair.
    x = jax.random.normal(jax.random.key(42), _shape(layout, BATCH),
                          jnp.float32)
    x_big = jax.random.normal(jax.random.key(43),
                              _shape(layout, BATCH * NUM_MC), jnp.float32)
    fwd_scan, state_scan = _build_bayes("bayes", layout, emission="scan")
    det_fwd, det_state = _build_det(layout)
    float(fwd_scan(state_scan, x))  # compile + warm
    float(det_fwd(det_state, x))
    float(det_fwd(det_state, x_big))
    rounds = []
    for _ in range(3):
        t_s = _slope_once(fwd_scan, state_scan, x)
        t_d = min(NUM_MC * _slope_once(det_fwd, det_state, x),
                  _slope_once(det_fwd, det_state, x_big))
        rounds.append((t_s, t_d))
        _log(f"round: scan {t_s * 1e3:.2f} ms / det10 {t_d * 1e3:.2f} ms"
             f" -> {t_d / t_s:.4f}")
    t_scan = _median([r[0] for r in rounds])
    t_det = _median([r[1] for r in rounds])
    # free the headline block's device residents before the aux
    # sections — x_big alone is 0.77 GB and the states/executables held
    # by these locals pushed the train sections into RESOURCE_EXHAUSTED
    del fwd_scan, state_scan, det_fwd, det_state, x_big
    jax.clear_caches()

    emission = "scan" if t_scan < t_vmap else "vmap"
    t_bayes = min(t_scan, t_vmap)
    bayes_ips = BATCH / t_bayes
    det10_ips = BATCH / t_det
    # vs_baseline = median of the PER-ROUND ratios for the WINNING
    # emission (so the headline always lies inside its own band and the
    # band always describes the headline's emission; a ratio of two
    # medians taken from different rounds could fall outside the band)
    if emission == "scan":
        ratio_band = sorted(d / s for s, d in rounds)
    else:
        ratio_band = sorted(d / t_vmap for _, d in rounds)
    vs_baseline = _median(ratio_band)
    flops = BATCH * NUM_MC * RESNET50_FLOPS_PER_IMG

    extras = {}

    def flipout_section():
        ts = _measure_flipout(layout)
        mode = min(ts, key=ts.get)
        t_flip = ts[mode]
        return {"flipout_ips": round(BATCH / t_flip, 2),
                "flipout_emission": mode,
                "flipout_ips_structured": round(
                    BATCH / ts["structured"], 2),
                "flipout_vs_2x_reparam": round(
                    (BATCH / t_flip) / (bayes_ips / 2), 4)}

    def int8_section():
        t_int8, t_int8_frozen = _measure_int8(layout)
        return {"int8_mc1_ips": round(BATCH / t_int8, 2),
                "int8_frozen_ips": round(BATCH / t_int8_frozen, 2)}

    def train_section():
        train = {}
        for kind in ("det", "mc1", "mc4"):
            train[kind] = _train_step_time(kind, TRAIN_BATCH)
        # training SoL: fwd+bwd ~ 3x forward FLOPs per MC draw
        mc4_flops = 3 * 4 * TRAIN_BATCH * RESNET50_FLOPS_PER_IMG
        return {
            "train_batch": TRAIN_BATCH,
            "train_det_ms": round(train["det"] * 1e3, 2),
            "train_mc1_ms": round(train["mc1"] * 1e3, 2),
            "train_mc4_ms": round(train["mc4"] * 1e3, 2),
            "train_mc4_ips": round(TRAIN_BATCH / train["mc4"], 1),
            "train_mc4_sol": round(
                sol_fraction(mc4_flops, train["mc4"]), 4),
        }

    def train_extra_section():
        # flipout train visibility (VERDICT r3 #3) + the opt-in
        # frozen-stat BN step (VERDICT r3 #8)
        t_flip = _train_step_time("flipout_mc4", TRAIN_BATCH)
        t_frozen = _train_step_time("mc4", TRAIN_BATCH, frozen_bn=True)
        return {
            "train_flipout_mc4_ms": round(t_flip * 1e3, 2),
            "train_flipout_mc4_ips": round(TRAIN_BATCH / t_flip, 1),
            "train_mc4_frozenbn_ms": round(t_frozen * 1e3, 2),
            "train_mc4_frozenbn_ips": round(TRAIN_BATCH / t_frozen, 1),
        }

    jax.clear_caches()
    _soft(extras, "flipout", flipout_section)
    _soft(extras, "train", train_section)
    _soft(extras, "train_extra", train_extra_section)
    _soft(extras, "int8", int8_section)
    _soft(extras, "int8_mc10", lambda: _measure_int8_mc10(layout))

    alt = "NHWC" if layout == "NCHW" else "NCHW"
    print(json.dumps({
        "metric": "bayesian_resnet50_mc10_inference",
        "value": round(bayes_ips, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
        "layout": layout,
        "emission": emission,
        "vs_baseline_band": [round(ratio_band[0], 4),
                             round(ratio_band[-1], 4)],
        "bayes_ips_vmap": round(BATCH / t_vmap, 2),
        "sol_bayes": round(sol_fraction(flops, t_bayes), 4),
        "sol_det": round(sol_fraction(flops, t_det), 4),
        f"bayes_ips_{alt.lower()}": round(BATCH / results[alt][0], 2),
        f"det10_ips_{alt.lower()}": round(BATCH / results[alt][1], 2),
        **extras,
    }))


if __name__ == "__main__":
    main()
