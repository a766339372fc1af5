"""Native C++ DataLoader: correctness, determinism, normalization."""

import numpy as np
import pytest

from bayesian_torch_tpu.data import DataLoader
from bayesian_torch_tpu.data.loader import native_available


def _dataset(n=257, shape=(3, 8, 8)):
    rs = np.random.RandomState(0)
    x = rs.randn(n, *shape).astype(np.float32)
    y = rs.randint(0, 10, n).astype(np.int32)
    return x, y


def test_native_lib_builds():
    assert native_available(), "g++ build of csrc/loader.cpp failed"


def test_epoch_covers_every_sample_once():
    x, y = _dataset(256)
    loader = DataLoader(x, y, batch_size=32, shuffle=True, num_workers=4)
    seen = []
    for xb, yb in loader.epoch(0):
        assert xb.shape == (32, 3, 8, 8)
        assert yb.shape == (32,)
        seen.append(yb)
    seen = np.concatenate(seen)
    assert len(seen) == 256
    # every (x,y) pair consistent: recover identity via matching rows
    # simpler: label multiset preserved
    assert sorted(seen.tolist()) == sorted(y.tolist())


def test_x_y_pairing_preserved():
    x, y = _dataset(128, shape=(4,))
    # make x[i,0] encode i
    x[:, 0] = np.arange(128, dtype=np.float32)
    loader = DataLoader(x, y, batch_size=16, shuffle=True, num_workers=3)
    for xb, yb in loader.epoch(1):
        idx = xb[:, 0].astype(int)
        np.testing.assert_array_equal(yb, y[idx])


def test_shuffle_determinism_per_seed():
    x, y = _dataset(128, shape=(4,))
    l1 = DataLoader(x, y, batch_size=16, seed=7, num_workers=2)
    l2 = DataLoader(x, y, batch_size=16, seed=7, num_workers=4)
    b1 = [yb.copy() for _, yb in l1.epoch(0)]
    b2 = [yb.copy() for _, yb in l2.epoch(0)]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)


def test_epochs_reshuffle():
    x, y = _dataset(128, shape=(4,))
    loader = DataLoader(x, y, batch_size=128, seed=3, num_workers=2)
    e1 = next(iter(loader.epoch(0)))[1].copy()
    loader2 = DataLoader(x, y, batch_size=128, seed=3, num_workers=2)
    loader2._lib and loader2._lib.bt_loader_start_epoch  # touch
    # second epoch from the same loader shuffles differently
    _ = list(loader.epoch(0))
    e2 = next(iter(loader.epoch(1)))[1].copy()
    assert np.any(e1 != e2)


def test_normalization_fused():
    x, y = _dataset(64, shape=(4,))
    loader = DataLoader(x, y, batch_size=64, shuffle=False,
                        num_workers=2, scale=2.0, shift=0.5)
    xb, yb = next(iter(loader.epoch(0)))
    np.testing.assert_allclose(xb, (x - 0.5) * 2.0, rtol=1e-6)


def test_drop_last_false():
    x, y = _dataset(100, shape=(4,))
    loader = DataLoader(x, y, batch_size=32, drop_last=False,
                        shuffle=False, num_workers=2)
    sizes = [len(yb) for _, yb in loader.epoch(0)]
    assert sizes == [32, 32, 32, 4]


def test_numpy_fallback_equivalence():
    x, y = _dataset(64, shape=(4,))
    loader = DataLoader(x, y, batch_size=16, shuffle=False, num_workers=2)
    native = [(xb.copy(), yb.copy()) for xb, yb in loader.epoch(0)]
    fallback = list(loader._numpy_epoch(0))
    for (nx, ny), (fx, fy) in zip(native, fallback):
        np.testing.assert_allclose(nx, fx)
        np.testing.assert_array_equal(ny, fy)
