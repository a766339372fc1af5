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
        # set_value (not [...]) — the first observation grows the
        # scalar ±inf seed to per-channel shape (C,)
        self.min_val.set_value(jnp.minimum(self.min_val[...],
                                           jnp.min(x, axis=axes)))
        self.max_val.set_value(jnp.maximum(self.max_val[...],
                                           jnp.max(x, axis=axes)))
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
    """Running-histogram observer with torch HistogramObserver's
    L2-minimizing clip search (`torch.ao.quantization.HistogramObserver.
    _non_linear_param_search`, ported 1:1 to numpy — validated bit-close
    against the torch oracle in tests/test_observers.py).

    Behavioral note (matches torch, documented because it surprises):
    the objective is the expected L2 error of the quantized
    approximation, where clipped mass pays its full squared distance to
    the clip boundary. Rare *far* outliers therefore are NOT clipped —
    a 0.1% spike at 100σ costs vastly more to clip than the whole
    dataset's rounding noise costs to keep — and on such data the
    result equals MinMaxObserver's. The search narrows the range only
    when the L2 trade genuinely favors it (heavy-tailed data narrows a
    few percent; torch behaves identically).

    Recording is jit-safe: the histogram lives on fixed ``bins`` bins
    whose edges track the running [min, max]; when the range grows, the
    old counts are remapped onto the new edges through the piecewise-
    linear CDF (exact under the uniform-within-bin assumption — the
    same assumption torch's interpolating remap makes; total mass is
    conserved).
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
    def _get_norm(delta_begin, delta_end, density):
        """L2 norm of the quantization error over a uniform-density
        interval [delta_begin, delta_end] measured from the target
        level (torch HistogramObserver._get_norm)."""
        return density * (delta_end ** 3 - delta_begin ** 3) / 3.0

    def _quantization_error(self, hist, mn, mx, start_bin, end_bin,
                            dst_nbins=256):
        """Expected L2 error of quantizing the histogram onto
        ``dst_nbins`` levels spanning src bins [start_bin, end_bin]
        (torch HistogramObserver._compute_quantization_error, numpy).
        Out-of-range src bins clamp to the edge dst level and pay their
        full squared distance to it — this is why rare far outliers are
        never clipped (see class docstring)."""
        bin_width = (mx - mn) / self.bins
        dst_bin_width = bin_width * (end_bin - start_bin + 1) / dst_nbins
        if dst_bin_width == 0.0:
            return 0.0
        src_bin = np.arange(self.bins, dtype=np.float64)
        src_bin_begin = (src_bin - start_bin) * bin_width
        src_bin_end = src_bin_begin + bin_width
        dst_bin_of_begin = np.clip(
            np.floor(src_bin_begin / dst_bin_width), 0, dst_nbins - 1)
        dst_bin_of_begin_center = (dst_bin_of_begin + 0.5) * dst_bin_width
        dst_bin_of_end = np.clip(
            np.floor(src_bin_end / dst_bin_width), 0, dst_nbins - 1)
        density = hist / bin_width
        norm = self._get_norm(src_bin_begin - dst_bin_of_begin_center,
                              np.full(self.bins, dst_bin_width / 2), density)
        norm += (dst_bin_of_end - dst_bin_of_begin - 1) * self._get_norm(
            -dst_bin_width / 2, dst_bin_width / 2, density)
        dst_bin_of_end_center = (dst_bin_of_end + 0.5) * dst_bin_width
        norm += self._get_norm(-dst_bin_width / 2,
                               src_bin_end - dst_bin_of_end_center, density)
        return float(norm.sum())

    def _non_linear_param_search(self, hist, mn, mx):
        """Torch's iterative start/end narrowing: walk quantile bounds
        inward in 1e-5 steps, move whichever side trails, accept a move
        only while the L2 quantization error keeps decreasing. Returns
        the chosen (new_min, new_max). Inner scans use searchsorted on
        the cumulative histogram — identical result to torch's
        linear walk, minus the O(bins) rescans."""
        bin_width = (mx - mn) / self.bins
        total = float(hist.sum())
        csum = np.cumsum(hist)
        stepsize = 1e-5
        alpha, beta = 0.0, 1.0
        start_bin, end_bin = 0, self.bins - 1
        norm_min = np.inf
        while alpha < beta:
            next_alpha = alpha + stepsize
            next_beta = beta - stepsize
            # first bin (from the left) at/above the alpha quantile,
            # last bin (from the right) at/below the beta quantile
            left = int(np.searchsorted(csum, next_alpha * total, "left"))
            left = min(max(left, start_bin), end_bin)
            right = int(np.searchsorted(csum, next_beta * total, "right")) - 1
            right = max(min(right, end_bin), start_bin)
            next_start, next_end = start_bin, end_bin
            if (left - start_bin) > (end_bin - right):
                next_start = left
                alpha = next_alpha
            else:
                next_end = right
                beta = next_beta
            if next_start == start_bin and next_end == end_bin:
                continue
            norm = self._quantization_error(hist, mn, mx, next_start,
                                            next_end)
            if norm > norm_min:
                break
            norm_min = norm
            start_bin, end_bin = next_start, next_end
        return mn + bin_width * start_bin, mn + bin_width * (end_bin + 1)

    def calculate_qparams(self):
        mn = float(self.min_val[...])
        mx = float(self.max_val[...])
        hist = np.asarray(self.histogram[...], np.float64)
        if not (mn < mx) or hist.sum() <= 0:
            return MinMaxObserver.calculate_qparams(self)  # shared fallback
        new_mn, new_mx = self._non_linear_param_search(hist, mn, mx)
        if self.dtype == "qint8":
            amax = max(abs(new_mn), abs(new_mx))
            return (amax / 127.5 if amax > 0 else 0.1), 0.0
        new_mn, new_mx = min(new_mn, 0.0), max(new_mx, 0.0)
        scale = (new_mx - new_mn) / 255.0
        if scale <= 0:
            return 0.1, 0.0
        zp = round(-new_mn / scale)
        return scale, float(min(max(zp, 0), 255))
