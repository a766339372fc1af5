"""Measure the mounted reference (IntelLabs/bayesian-torch, torch CPU)
on its own canonical configs, so BASELINE.md can carry a direct
ours-vs-reference throughput row per workload.

This environment exposes ONE CPU core to torch (nproc=1), so absolute
numbers are what a single-core deployment would see; per-forward time
is measured with torch.no_grad() on synthetic data (the reference's
scripts print throughput at runtime but record nothing —
examples/main_bayesian_cifar.py:508). Batch sizes are scaled down
where a canonical batch would take minutes per forward; throughput is
per-image and MC-normalized, so rows are comparable.

Usage: python benchmarks/bench_reference_cpu.py [scnn rn20 rn50 flipout lstm]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.manual_seed(0)


def time_mc_forward(model, x, num_mc, reps=3):
    """Median wall time of ONE model forward; returns imgs/s at num_mc."""
    model.eval()
    with torch.no_grad():
        model(x)  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            model(x)
            ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[len(ts) // 2]
    ips = x.shape[0] / (t * num_mc)
    return t, ips


def row(name, config, t, ips):
    print(f"{name:>14} | {config:<42} | fwd {t * 1e3:9.1f} ms | "
          f"{ips:10.2f} imgs/s (MC-normalized)")


def bench_scnn():
    from bayesian_torch.models.bayesian.simple_cnn_variational import SCNN
    m = SCNN()
    x = torch.randn(256, 1, 28, 28)
    t, ips = time_mc_forward(m, x, 20)
    row("SCNN-MNIST", "bs=256 (canonical 10000), MC=20", t, ips)


def bench_rn20():
    from bayesian_torch.models.bayesian.resnet_variational import resnet20
    m = resnet20()
    x = torch.randn(128, 3, 32, 32)
    t, ips = time_mc_forward(m, x, 50)
    row("CIFAR-RN20", "bs=128 (canonical 1000), MC=50", t, ips)


def bench_rn50():
    from bayesian_torch.models.bayesian.resnet_variational_large import (
        resnet50,
    )
    m = resnet50()
    x = torch.randn(8, 3, 224, 224)
    t, ips = time_mc_forward(m, x, 10, reps=3)
    row("RN50-reparam", "bs=8 (flagship cfg bs=128), MC=10", t, ips)


def bench_flipout():
    from bayesian_torch.models.bayesian.resnet_flipout_large import (
        resnet50,
    )
    m = resnet50()
    x = torch.randn(8, 3, 224, 224)
    t, ips = time_mc_forward(m, x, 10, reps=3)
    row("RN50-flipout", "bs=8, MC=10", t, ips)


def bench_lstm():
    from bayesian_torch.layers import LSTMReparameterization
    m = LSTMReparameterization(in_features=64, out_features=64)
    x = torch.randn(128, 64, 64)  # (batch, seq, feat)
    m.eval()
    with torch.no_grad():
        m(x)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            m(x)
            ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[1]
    steps = 128 * 64 / t
    print(f"{'LSTM':>14} | bs=128 seq=64 hidden=64, per-step resample"
          f"     | fwd {t * 1e3:9.1f} ms | {steps:10.0f} cell-steps/s")


ALL = {"scnn": bench_scnn, "rn20": bench_rn20, "rn50": bench_rn50,
       "flipout": bench_flipout, "lstm": bench_lstm}

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    print(f"reference on CPU: torch {torch.__version__}, "
          f"{torch.get_num_threads()} thread(s)")
    for name in which:
        ALL[name]()
