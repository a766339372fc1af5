"""Calibration observers (torch MinMaxObserver equivalents).

The reference inserts torch QuantStubs with MinMaxObservers into each
Bayesian layer (linear_variational.py:123-129) and reads their
scale/zero_point after calibration. Here an observer is a tiny nnx
module holding running min/max as mutable Variables; it works both
eagerly and under jit (state updates like BatchStat).

Scale conventions match torch:
- qint8 per-tensor symmetric: scale = max(|min|,|max|)/127.5, zp = 0
- quint8 affine:              scale = (max-min)/255, zp = round(-min/scale)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


class MinMaxObserver(nnx.Module):

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
