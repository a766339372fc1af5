"""Profiling / speed-of-light helpers (SURVEY.md §5 "tracing").

The reference hand-times batches with AverageMeter prints
(main_bayesian_cifar.py:533-548); the TPU build adds first-class
profiler traces and a %-of-speed-of-light estimate for the flagship
metric.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
from collections import Counter

import jax

# peak bf16 TFLOP/s per chip (dense MXU), by TPU generation
PEAK_BF16_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5 lite": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def device_peak_tflops(default: float = 197.0) -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_BF16_TFLOPS.items():
        if k in kind:
            return v
    return default


def sol_fraction(flops_per_step: float, step_seconds: float) -> float:
    """Fraction of bf16 speed-of-light achieved by a step."""
    achieved = flops_per_step / step_seconds / 1e12
    return achieved / device_peak_tflops()


@contextlib.contextmanager
def trace(logdir: str = "/tmp/bayesian_torch_tpu_trace"):
    """jax.profiler trace context; view with tensorboard or summarize
    with ``summarize_trace``."""
    with jax.profiler.trace(logdir):
        yield logdir


def summarize_trace(logdir: str, top: int = 20, device_only: bool = True):
    """Aggregate op durations from a trace written by ``trace``.

    With ``device_only`` (default) only events on the TPU device's
    "XLA Ops" track are counted — the actual on-chip fusion/op
    executions — so the table is a per-op device-time profile rather
    than a host python mirror. Returns [(op_name, total_ms)] desc.
    """
    totals = Counter()
    for f in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        dev_pids, op_tids = set(), set()
        for ev in events:
            if ev.get("ph") == "M":
                if ev["name"] == "process_name" and "TPU" in \
                        ev["args"].get("name", ""):
                    dev_pids.add(ev["pid"])
                if ev["name"] == "thread_name" and \
                        ev["args"].get("name") == "XLA Ops":
                    op_tids.add((ev["pid"], ev.get("tid")))
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            if device_only:
                if ev.get("pid") not in dev_pids:
                    continue
                if op_tids and (ev["pid"], ev.get("tid")) not in op_tids:
                    continue
            totals[ev.get("name", "?")] += ev["dur"]
    return [(name, dur / 1000.0) for name, dur in totals.most_common(top)]
