"""Annotated per-fusion device profile: trace + HLO cross-reference.

TPU fusions show up in traces as opaque ``fusion.N`` names; the convs
and elementwise work live INSIDE them. This tool compiles the flagship
step, parses the optimized HLO to map every fusion to its contents
(convolution shapes / dominant ops), traces a few steps, and prints a
table attributing device time to convs vs elementwise vs sampling —
the "where do the other 60% go" evidence VERDICT r2 items 1+2 ask for.

Usage: python benchmarks/profile_annotate.py [bayes|flipout|det]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmarks._timing import step_time  # noqa: E402
from benchmarks.profile_flagship import TRACE_STEPS, _build  # noqa: E402


def parse_hlo(text):
    """Map instruction name -> descriptor of what it computes.

    For fusions, inspect the called computation: record conv shapes
    (``convolution`` ops), dots, and the op-count breakdown otherwise.
    """
    # computation name -> list of (op, line)
    comps = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"\s*(?:ENTRY )?%?([\w\.\-]+)(?: \([^)]*\))? "
                     r"-> .* {", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is not None:
            m = re.match(r"\s*(?:ROOT )?%?[\w\.\-]+ = (\S+) (\w[\w\-]*)\(",
                         line)
            if m:
                comps[cur].append((m.group(2), m.group(1), line))

    # fusion instr name -> called computation
    fusion_calls = {}
    for m in re.finditer(r"%?([\w\.\-]+) = \S+ fusion\(.*?calls=%?"
                         r"([\w\.\-]+)", text):
        fusion_calls[m.group(1)] = m.group(2)

    desc = {}
    for fname, cname in fusion_calls.items():
        ops = comps.get(cname, [])
        convs = [(shape, ln) for op, shape, ln in ops
                 if op in ("convolution", "dot")]
        if convs:
            # summarize conv output shapes
            shapes = ",".join(s for s, _ in convs[:3])
            desc[fname] = f"CONV {shapes}"
        else:
            counts = Counter(op for op, _, _ in ops)
            top = ",".join(f"{o}x{c}" for o, c in counts.most_common(4))
            desc[fname] = f"elem [{top}]"
    return desc


def classify(name, d):
    if d.startswith("CONV"):
        return "conv/dot fusions"
    if "rng" in name or "rng" in d:
        return "rng"
    if "copy" in name or "transpose" in name or "bitcast" in name:
        return "copy/layout"
    if "reduce" in d or "reduce" in name:
        return "reduce"
    return "elementwise"


def main():
    kind = (sys.argv[1:] or ["bayes"])[0]
    from bayesian_torch_tpu.utils.profiling import summarize_trace, trace

    fwd, state, x = _build(kind)
    t = step_time(fwd, state, x)
    hlo = fwd.lower(state, x).compile().as_text()
    with open(f"/tmp/hlo_{kind}.txt", "w") as f:
        f.write(hlo)
    desc = parse_hlo(hlo)
    logdir = f"/tmp/trace_{kind}_ann"
    with trace(logdir):
        for _ in range(TRACE_STEPS):
            r = fwd(state, x)
        float(r)
    rows = summarize_trace(logdir, top=4000)
    total = sum(ms for _, ms in rows) / TRACE_STEPS
    print(f"== {kind}: step {t * 1e3:.2f} ms, device sum {total:.2f} "
          f"ms/step ==")
    buckets = Counter()
    for name, ms in rows:
        d = desc.get(name, name)
        buckets[classify(name, d)] += ms / TRACE_STEPS
    print("-- buckets --")
    for b, ms in buckets.most_common():
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}%  {b}")
    print("-- top 30 --")
    for name, ms in rows[:30]:
        per = ms / TRACE_STEPS
        print(f"{per:8.3f} {100 * per / total:5.1f}%  {name[:28]:28} "
              f"{desc.get(name, '?')[:110]}")


if __name__ == "__main__":
    main()
