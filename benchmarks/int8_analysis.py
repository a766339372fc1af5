"""INT8 qresnet50: HLO requant-fusion analysis + missing benches.

VERDICT r2 item 5 asked whether the s32->u8 requant fuses into the
conv in HLO or materializes s32 in HBM. Measured round 3 (v5e):

- requant FUSES: all 54 conv-containing fusions in the compiled
  qresnet50 step also contain the u8 round/clamp/convert epilogue;
  zero conv fusions have an s32 root (this script prints the count).
- raw XLA int8 convs are ~2x bf16 at most RN50 shapes (s8 speedups
  1.9-2.2x at 64..512ch; 0.88x at 1024->256k1 — /tmp/int8_rawconv3.py
  pattern: full-output accumulate inside one jit, R=24 repeats).
- the model-level gap (int8 1.16x over bf16 at bs128 MC-1: 10.17 vs
  11.81 ms; 673 imgs/s MC-10 bs32; quantized-flipout MC-1 1956
  imgs/s) is therefore NOT the conv kernels or the requant epilogue:
  it is the per-step quantized weight-build (eps draw + quantize +
  qmul/qadd per layer) and the inter-layer activation quantize
  passes, which are weight-/activation-sized elementwise work that
  does not shrink with batch. The reference redraws quantized weights
  every forward (quantize_linear_variational.py:172-189) — parity
  keeps that semantic; a serving deployment can hoist the draw across
  steps, at which point the conv 2x applies directly.
"""
import sys, json, re
from collections import Counter
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from flax import nnx
from benchmarks._timing import step_time
from bayesian_torch_tpu.parallel import mc_forward

BATCH = 32

def build(kind, mc, df="NHWC"):
    if kind == "qreparam":
        from bayesian_torch_tpu.models.bayesian.quantized_resnet_variational_large import qresnet50
    else:
        from bayesian_torch_tpu.models.bayesian.quantized_resnet_flipout_large import qresnet50
    q = qresnet50(rngs=nnx.Rngs(params=jax.random.key(0),
                                noise=jax.random.key(1, impl="rbg")),
                  fuse_conv_bn=True, data_format=df)
    gd, st = nnx.split(q)
    if mc == 1:
        @jax.jit
        def fwd(st, x):
            out, _ = nnx.merge(gd, st)(x)
            return out.mean()
    else:
        @jax.jit
        def fwd(st, x):
            return mc_forward(nnx.merge(gd, st), x, mc,
                              return_kl=False).mean()
    x = jax.random.normal(jax.random.key(7), (BATCH, 224, 224, 3), jnp.float32)
    return fwd, st, x

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("all", "hlo"):
    fwd, st, x = build("qreparam", 1)
    t = step_time(fwd, st, x)
    print(json.dumps({"metric": "qresnet50_mc1_bs32", "ms": round(t*1e3, 2),
                      "imgs_s": round(BATCH/t, 1)}), flush=True)
    hlo = fwd.lower(st, x).compile().as_text()
    open("/tmp/hlo_qresnet50.txt", "w").write(hlo)
    # does any fusion contain BOTH a convolution and the u8 requant
    # (round/clip/convert-u8), or do s32 conv outputs materialize?
    comps, cur = {}, None
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w\.\-]+)(?: \([^)]*\))? -> .* {", line)
        if m: cur = m.group(1); comps[cur] = []
        elif line.startswith("}"): cur = None
        elif cur:
            m = re.match(r"\s*(?:ROOT )?%?[\w\.\-]+ = (\S+) (\w[\w\-]*)\(", line)
            if m: comps[cur].append((m.group(2), m.group(1)))
    fused = separate = 0
    s32_outputs = 0
    for cname, ops in comps.items():
        has_conv = any(o == "convolution" for o, s in ops)
        has_u8 = any(s.startswith("u8") for o, s in ops)
        if has_conv and has_u8: fused += 1
        elif has_conv:
            separate += 1
            root = ops[-1][1] if ops else "?"
            if root.startswith("s32"): s32_outputs += 1
    print(json.dumps({"conv_fusions_with_u8_requant": fused,
                      "conv_fusions_without": separate,
                      "conv_fusions_s32_root": s32_outputs}), flush=True)

if mode in ("all", "mc10"):
    fwd, st, x = build("qreparam", 10)
    t = step_time(fwd, st, x)
    print(json.dumps({"metric": "qresnet50_mc10_bs32", "ms": round(t*1e3, 2),
                      "imgs_s": round(BATCH/t, 1)}), flush=True)

if mode in ("all", "flipout"):
    fwd, st, x = build("qflipout", 1)
    t = step_time(fwd, st, x)
    print(json.dumps({"metric": "qresnet50_flipout_mc1_bs32",
                      "ms": round(t*1e3, 2),
                      "imgs_s": round(BATCH/t, 1)}), flush=True)
