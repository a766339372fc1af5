"""Offline re-analysis of a captured train-step trace against its HLO.

profile_train.py's first pass showed most train-step fusions as `?`:
the train HLO has tuple-typed fusions, duplicated instruction names
across nested computations, and `.remat` clones that the inference-era
parser missed.  This tool re-parses the dumped HLO robustly (handles
tuple types, records `metadata op_name`/source attribution, unions
duplicate names) and re-buckets the already-captured device trace — no
TPU time needed.

Usage: python benchmarks/analyze_train_trace.py [kind]   (default mc4)
Reads /tmp/hlo_train_<kind>.txt and /tmp/trace_train_<kind>.
"""

from __future__ import annotations

import re
import sys
from collections import Counter, defaultdict

TRACE_STEPS = 4


def parse(text):
    """instr name -> dict(conv: bool, opname: str, out: str).

    Duplicate names (nested computations / remat clones) are unioned:
    conv if ANY candidate contains a convolution/dot call.
    """
    # fused computation -> set of ops inside
    comps = defaultdict(Counter)
    cur = None
    for line in text.splitlines():
        m = re.match(r"\s*%?([\w\.\-]+)\s(?:\([^)]*\))?\s*->.*\{\s*$", line)
        if m:
            cur = m.group(1)
            continue
        if line.startswith("}") or line.strip() == "}":
            cur = None
            continue
        if cur is not None:
            m = re.match(r"\s*(?:ROOT )?%?[\w\.\-]+ = .*? (\w[\w\-]*)\(",
                         line)
            if m:
                comps[cur][m.group(1)] += 1

    info = defaultdict(lambda: {"conv": False, "opnames": Counter(),
                                "out": ""})
    for line in text.splitlines():
        if " fusion(" not in line and " = " not in line:
            continue
        m = re.match(r"\s*(?:ROOT )?%?([\w\.\-]+) = (.*?) "
                     r"(fusion|convolution|custom-call|copy|transpose|"
                     r"reduce|reduce-window|select-and-scatter|"
                     r"all-reduce|rng-bit-generator|dot)\(", line)
        if not m:
            continue
        name, outty, op = m.groups()
        rec = info[name]
        rec["out"] = rec["out"] or outty[:60]
        om = re.search(r'op_name="([^"]*)"', line)
        sf = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
        label = om.group(1) if om else op
        if sf:
            label += f" [{sf.group(1).rsplit('/', 1)[-1]}:{sf.group(2)}]"
        rec["opnames"][label] += 1
        if op in ("convolution", "dot"):
            rec["conv"] = True
        elif op == "fusion":
            cm = re.search(r"calls=%?([\w\.\-]+)", line)
            if cm:
                ops = comps.get(cm.group(1), Counter())
                if ops.get("convolution") or ops.get("dot"):
                    rec["conv"] = True
    return info


def classify(name, rec):
    if rec["conv"]:
        return "conv/dot fusions"
    n = name.lower()
    ops = " ".join(rec["opnames"])
    if "rng" in n or "rng" in ops:
        return "rng"
    if n.startswith(("copy", "transpose", "bitcast")):
        return "copy/layout"
    if ("reduce" in n or "select-and-scatter" in n
            or "reduce" in ops.lower()):
        return "reduce"
    return "elementwise"


def main():
    kind = (sys.argv[1:] or ["mc4"])[0]
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bayesian_torch_tpu.utils.profiling import summarize_trace

    info = parse(open(f"/tmp/hlo_train_{kind}.txt").read())
    rows = summarize_trace(f"/tmp/trace_train_{kind}", top=4000)
    total = sum(ms for _, ms in rows) / TRACE_STEPS
    buckets = Counter()
    unknown = 0.0
    for name, ms in rows:
        base = name
        if base.endswith(".remat") or ".remat" in base:
            base = base.split(".remat")[0] + base.split(".remat")[-1] \
                if not base.endswith(".remat") else base[: -len(".remat")]
        rec = info.get(name) or info.get(base)
        if rec is None:
            unknown += ms / TRACE_STEPS
            buckets["UNATTRIBUTED"] += ms / TRACE_STEPS
            continue
        buckets[classify(name, rec)] += ms / TRACE_STEPS
    print(f"== train {kind}: device sum {total:.2f} ms/step ==")
    for b, ms in buckets.most_common():
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}%  {b}")
    print("-- top 40 by op_name --")
    agg = Counter()
    for name, ms in rows:
        rec = info.get(name) or info.get(name.split(".remat")[0] if
                                         ".remat" in name else name)
        if rec and rec["opnames"]:
            label = rec["opnames"].most_common(1)[0][0]
        else:
            label = f"? {name}"
        agg[label] += ms / TRACE_STEPS
    for label, ms in agg.most_common(40):
        print(f"{ms:8.3f} {100 * ms / total:5.1f}%  {label[:110]}")


if __name__ == "__main__":
    main()
