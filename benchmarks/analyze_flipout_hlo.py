"""Map the scanned-flipout profile's fusion.NNNN names to their HLO ops
(VERDICT r4 #2: attribute the flipout body's time over the 2x-reparam
bound). Compiles the flagship flipout scan step, dumps the optimized
HLO, and prints each named fusion's root/op mix so the trace table in
/tmp/r05_flipout_profile.log becomes attributable.

Usage: python benchmarks/analyze_flipout_hlo.py [names...]
       (default: the top fusions from the round-5 profile)
"""

from __future__ import annotations

import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

sys.path.insert(0, "/root/repo")

BATCH = 128
NUM_MC = 10
IMG = 224


def main():
    from bayesian_torch_tpu.models.bayesian.resnet_flipout_large \
        import resnet50
    from bayesian_torch_tpu.parallel import mc_forward

    model = resnet50(rngs=nnx.Rngs(
        params=jax.random.key(0),
        noise=jax.random.key(1, impl="rbg")), data_format="NHWC")
    model.eval()
    for _, mod in nnx.iter_modules(model):
        if hasattr(mod, "compute_dtype"):
            mod.compute_dtype = jnp.bfloat16
    gd, st = nnx.split(model)

    @jax.jit
    def fwd(st, x):
        m = nnx.merge(gd, st)
        return mc_forward(m, x, NUM_MC, return_kl=False,
                          emission="scan").astype(jnp.float32).mean()

    x = jax.random.normal(jax.random.key(42), (BATCH, IMG, IMG, 3),
                          jnp.float32)
    hlo = fwd.lower(st, x).compile().as_text()
    with open("/tmp/flipout_scan_hlo.txt", "w") as f:
        f.write(hlo)
    print(f"HLO dumped: {len(hlo) / 1e6:.1f} MB", file=sys.stderr)

    # per-fusion computation: name -> set of interesting op kinds
    # fused_computation bodies are named %fused_computation.N and
    # referenced by fusion.N; find each fusion instruction's called
    # computation and summarize its ops.
    comp_ops = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"%?(\S+) \(.*\) -> .* {", line)
        if line.startswith("%fused_") or re.match(
                r"%?fused_computation[\.\w]*\s", line):
            name = line.split()[0].lstrip("%")
            cur = name
            comp_ops[cur] = []
        elif cur and line.startswith("}"):
            cur = None
        elif cur:
            op = re.search(r"= \S+ (\w[\w-]*)\(", line)
            if op:
                comp_ops[cur].append(op.group(1))

    # fusion instruction -> computation
    fus2comp = {}
    for m in re.finditer(
            r"%?(fusion[\.\w]*) = \S+ fusion\(.*?calls=%?([\w\.]+)",
            hlo):
        fus2comp[m.group(1)] = m.group(2)

    names = sys.argv[1:] or [
        "fusion.7689", "fusion.7660", "fusion.7712", "fusion.7733",
        "fusion.7761", "fusion.7741", "fusion.7735", "fusion.7639",
        "fusion.7803", "fusion.7782", "fusion.7676", "fusion.7705"]
    from collections import Counter
    for n in names:
        comp = fus2comp.get(n)
        ops = Counter(comp_ops.get(comp, []))
        # also surface the output shape of the fusion instruction
        m = re.search(re.escape(n) + r" = (\S+) fusion\(", hlo)
        shp = m.group(1) if m else "?"
        interesting = {k: v for k, v in ops.items()
                       if k in ("convolution", "dot", "multiply", "add",
                                "maximum", "rng-bit-generator",
                                "erf-inv", "log", "sqrt", "cosine",
                                "transpose", "copy", "select",
                                "reduce")}
        print(f"{n}: {shp} :: {dict(interesting)}")


if __name__ == "__main__":
    main()
