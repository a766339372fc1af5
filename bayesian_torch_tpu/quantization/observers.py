"""Calibration observers (torch observer equivalents) + QConfig.

The reference inserts torch QuantStubs with MinMaxObservers into each
Bayesian layer (linear_variational.py:123-129) and reads their
scale/zero_point after calibration; its layer files also import
HistogramObserver / PerChannelMinMaxObserver / QConfig into the
``bayesian_torch.layers`` namespace (conv_flipout.py:40-41), so a
reference user finds all four names here too. Here an observer is a
tiny nnx module holding running state as mutable Variables; recording
works both eagerly and under jit (state updates like BatchStat), and
``calculate_qparams`` is a host-side readout.

Scale conventions match torch:
- qint8 per-tensor symmetric: scale = max(|min|,|max|)/127.5, zp = 0
- quint8 affine:              scale = (max-min)/255, zp = round(-min/scale)

``Observer.with_args(**kw)`` mirrors the torch idiom (a zero-arg
factory), so reference-style ``QConfig(weight=MinMaxObserver.with_args(
dtype='qint8'), activation=...)`` ports verbatim.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np
from flax import nnx


class _ObserverBase(nnx.Module):
    """Shared observer plumbing (the torch ``with_args`` factory idiom,
    torch/ao/quantization/observer.py ObserverBase.with_args)."""

    @classmethod
    def with_args(cls, **kwargs):
        """Return a zero-arg factory building this observer with
        ``kwargs`` pre-bound — drop-in for the torch classmethod."""
        return functools.partial(cls, **kwargs)


class QConfig(NamedTuple):
    """(activation, weight) observer-factory pair — the torch QConfig
    contract the reference passes to its QuantStubs
    (conv_flipout.py:146-148). Pass to ``quantization.prepare`` to pick
    calibration observers; each field is a zero-arg factory
    (``Observer.with_args(...)`` or the class itself)."""

    activation: Any
    weight: Any


class MinMaxObserver(_ObserverBase):

    def __init__(self, dtype: str = "qint8"):
        assert dtype in ("qint8", "quint8")
        self.dtype = dtype
        self.min_val = nnx.BatchStat(jnp.asarray(jnp.inf))
        self.max_val = nnx.BatchStat(jnp.asarray(-jnp.inf))

    def __call__(self, x):
        """Record min/max; passthrough (like a torch QuantStub in
        prepared mode)."""
        self.min_val[...] = jnp.minimum(self.min_val[...], jnp.min(x))
        self.max_val[...] = jnp.maximum(self.max_val[...], jnp.max(x))
        return x

    @property
    def observed(self) -> bool:
        return bool(jnp.isfinite(self.min_val[...]))

    def calculate_qparams(self):
        """(scale, zero_point) following torch observer semantics."""
        mn = float(self.min_val[...])
        mx = float(self.max_val[...])
        if not (mn <= mx):  # never observed
            mn, mx = 0.0, 0.0
        mn = min(mn, 0.0)
        mx = max(mx, 0.0)
        if self.dtype == "qint8":
            amax = max(abs(mn), abs(mx))
            scale = amax / 127.5 if amax > 0 else 0.1
            return scale, 0.0
        scale = (mx - mn) / 255.0 if mx > mn else 0.1
        zp = round(-mn / scale)
        return scale, float(min(max(zp, 0), 255))


class PerChannelMinMaxObserver(_ObserverBase):
    """Per-channel min/max along ``ch_axis`` (torch
    PerChannelMinMaxObserver, imported by the reference layer files).

    ``calculate_qparams`` returns per-channel np arrays. The Bayesian
    quant_dict harvest path is per-tensor like the reference's, so this
    observer is for standalone / weight-granular use; routing it into a
    harvested slot raises a clear error in bnn_to_qbnn.
    """

    def __init__(self, dtype: str = "qint8", ch_axis: int = 0):
        assert dtype in ("qint8", "quint8")
        self.dtype = dtype
        self.ch_axis = ch_axis
        # scalar ±inf broadcast to (C,) on the first observation
        self.min_val = nnx.BatchStat(jnp.asarray(jnp.inf))
        self.max_val = nnx.BatchStat(jnp.asarray(-jnp.inf))

    def __call__(self, x):
        axes = tuple(i for i in range(x.ndim) if i != self.ch_axis % x.ndim)
        # .value (not [...]) — the first observation grows the scalar
        # ±inf seed to per-channel shape (C,)
        self.min_val.value = jnp.minimum(self.min_val[...],
                                         jnp.min(x, axis=axes))
        self.max_val.value = jnp.maximum(self.max_val[...],
                                         jnp.max(x, axis=axes))
        return x

    @property
    def observed(self) -> bool:
        return bool(jnp.all(jnp.isfinite(self.min_val[...])))

    def calculate_qparams(self):
        """Per-channel (scale, zero_point) np arrays, torch formulas."""
        mn = np.minimum(np.asarray(self.min_val[...], np.float64), 0.0)
        mx = np.maximum(np.asarray(self.max_val[...], np.float64), 0.0)
        if mn.ndim == 0:  # never observed
            mn = np.zeros((1,))
            mx = np.zeros((1,))
        if self.dtype == "qint8":
            amax = np.maximum(np.abs(mn), np.abs(mx))
            scale = np.where(amax > 0, amax / 127.5, 0.1)
            return scale, np.zeros_like(scale)
        scale = np.where(mx > mn, (mx - mn) / 255.0, 0.1)
        zp = np.clip(np.round(-mn / scale), 0, 255)
        return scale, zp


class HistogramObserver(_ObserverBase):
    """Running-histogram observer with an MSE-minimizing clip search
    (torch HistogramObserver's role: pick (min, max) that minimize
    quantization error instead of the raw extrema, so rare outliers
    don't blow up the scale).

    Recording is jit-safe: the histogram lives on fixed ``bins`` bins
    whose edges track the running [min, max]; when the range grows, the
    old counts are remapped onto the new edges through the piecewise-
    linear CDF (exact under the uniform-within-bin assumption — the
    same assumption torch's interpolating remap makes; total mass is
    conserved).

    ``calculate_qparams`` runs a host-side grid search over clip
    candidates, scoring each with the histogram-expected MSE
    (in-range bins pay the uniform rounding noise width²/12, clipped
    bins pay the squared distance to the clip). This is a simpler
    search than torch's iterative one — same objective, coarser grid —
    and is exercised against MinMax on outlier data in
    tests/test_observers.py.
    """

    def __init__(self, dtype: str = "quint8", bins: int = 2048):
        assert dtype in ("qint8", "quint8")
        self.dtype = dtype
        self.bins = bins
        self.histogram = nnx.BatchStat(jnp.zeros((bins,), jnp.float32))
        self.min_val = nnx.BatchStat(jnp.asarray(jnp.inf))
        self.max_val = nnx.BatchStat(jnp.asarray(-jnp.inf))

    @staticmethod
    def _span(mn, mx):
        """Histogram support for running (min, max): widened by ±0.5
        when degenerate so constant data still gets a real bin. Used
        for both building and later remapping, so the two agree."""
        ok = mx > mn
        return jnp.where(ok, mn, mn - 0.5), jnp.where(ok, mx, mx + 0.5)

    def __call__(self, x):
        xf = x.astype(jnp.float32).reshape(-1)
        old_mn, old_mx = self.min_val[...], self.max_val[...]
        new_mn = jnp.minimum(old_mn, jnp.min(xf))
        new_mx = jnp.maximum(old_mx, jnp.max(xf))
        lo, hi = self._span(new_mn, new_mx)

        had_old = jnp.isfinite(old_mn)
        safe_omn = jnp.where(had_old, old_mn, 0.0)
        safe_omx = jnp.where(had_old, old_mx, 1.0)
        old_lo, old_hi = self._span(safe_omn, safe_omx)
        old_edges = jnp.linspace(old_lo, old_hi, self.bins + 1)
        cdf = jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(self.histogram[...])])
        new_edges = jnp.linspace(lo, hi, self.bins + 1)
        # piecewise-linear CDF evaluated at the new edges; jnp.interp
        # clamps outside the old range, so mass is conserved exactly
        f = jnp.interp(new_edges, old_edges, cdf)
        remapped = jnp.where(had_old, jnp.diff(f), 0.0)

        fresh, _ = jnp.histogram(xf, bins=self.bins, range=(lo, hi))
        self.histogram[...] = remapped + fresh.astype(jnp.float32)
        self.min_val[...] = new_mn
        self.max_val[...] = new_mx
        return x

    @property
    def observed(self) -> bool:
        return bool(jnp.isfinite(self.min_val[...]))

    @staticmethod
    def _clip_mse(centers, counts, lo, hi):
        """Expected quantization MSE for clip range [lo, hi]: in-range
        bins pay uniform rounding noise width²/12, clipped bins pay the
        squared distance to the clip. ``lo``/``hi`` may be scalars or
        (K,) candidate vectors; returns per-candidate totals."""
        lo = np.atleast_1d(np.asarray(lo, np.float64))
        hi = np.atleast_1d(np.asarray(hi, np.float64))
        c = centers[:, None]
        width = (hi - lo) / 255.0
        err = np.where(
            c < lo, (lo - c) ** 2,
            np.where(c > hi, (c - hi) ** 2, (width ** 2) / 12.0))
        return (counts[:, None] * err).sum(axis=0)

    def calculate_qparams(self):
        mn = float(self.min_val[...])
        mx = float(self.max_val[...])
        hist = np.asarray(self.histogram[...], np.float64)
        if not (mn < mx) or hist.sum() <= 0:
            return MinMaxObserver.calculate_qparams(self)  # shared fallback
        edges = np.linspace(mn, mx, self.bins + 1)
        centers = 0.5 * (edges[:-1] + edges[1:])
        if self.dtype == "qint8":
            # symmetric: search the clip amplitude a over a grid,
            # scoring the full [-a, a] range (256 levels)
            amax = max(abs(mn), abs(mx))
            cand = amax * np.linspace(1.0 / 256, 1.0, 256)
            errs = self._clip_mse(centers, hist, -cand, cand)
            best = float(cand[int(np.argmin(errs))])
            return best / 127.5, 0.0
        # affine: grid over (lo, hi) quantile cuts, always covering 0
        q = np.concatenate([[0.0], np.cumsum(hist)]) / hist.sum()
        grid = np.linspace(0.0, 1.0, 33)
        lo_cand = np.interp(grid[:16], q, edges)
        hi_cand = np.interp(grid[16:], q, edges)
        lo_cand = np.minimum(np.unique(lo_cand), 0.0)
        hi_cand = np.maximum(np.unique(hi_cand), 0.0)
        best_err, best_lo, best_hi = np.inf, min(mn, 0.0), max(mx, 0.0)
        for lo in lo_cand:
            errs = self._clip_mse(centers, hist, lo, hi_cand)
            i = int(np.argmin(errs))
            if errs[i] < best_err and hi_cand[i] > lo:
                best_err, best_lo, best_hi = float(errs[i]), float(lo), \
                    float(hi_cand[i])
        scale = (best_hi - best_lo) / 255.0
        if scale <= 0:
            return 0.1, 0.0
        zp = round(-best_lo / scale)
        return scale, float(min(max(zp, 0), 255))
