"""Shared slope-method timing for the tunneled TPU backend.

jax.block_until_ready does not block over the tunnel and scalar fetches
carry hundreds of ms of latency, so step time is a slope:
(t(N2 steps) - t(N1 steps)) / (N2 - N1), single scalar fetch per run,
median of 3 (see bench.py / BASELINE.md methodology notes).
"""

from __future__ import annotations

import time

N1, N2 = 3, 13


def step_time(fn, *args, n1=N1, n2=N2):
    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        float(r)
        return time.perf_counter() - t0

    run(2)  # compile + warm
    ts = []
    for _ in range(3):
        ts.append((run(n2) - run(n1)) / (n2 - n1))
    ts.sort()
    return ts[1]
