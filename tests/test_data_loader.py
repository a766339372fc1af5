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


class TestNpzBranch:
    """The real-data ingestion contract of examples/_data.py (the
    branch the synthetic-only tests never touched): a torchvision-dtype
    npz (uint8 pixel arrays in the raw dataset layout) must come out
    float32, NCHW, reference-normalized, with int32 labels."""

    def _write_mnist(self, tmp_path):
        import numpy as np

        rs = np.random.RandomState(0)
        x_tr = rs.randint(0, 256, (64, 28, 28), dtype=np.uint8)
        y_tr = rs.randint(0, 10, 64).astype(np.int64)
        x_te = rs.randint(0, 256, (32, 28, 28), dtype=np.uint8)
        y_te = rs.randint(0, 10, 32).astype(np.int64)
        np.savez(tmp_path / "mnist.npz", x_train=x_tr, y_train=y_tr,
                 x_test=x_te, y_test=y_te)
        return x_tr, y_tr

    def test_mnist_npz_shapes_dtype_normalization(self, tmp_path):
        import numpy as np

        from bayesian_torch_tpu.examples._data import load_mnist

        x_raw, y_raw = self._write_mnist(tmp_path)
        (x_tr, y_tr), (x_te, y_te) = load_mnist(data_dir=str(tmp_path))
        assert x_tr.shape == (64, 1, 28, 28) and x_te.shape == (32, 1, 28, 28)
        assert x_tr.dtype == np.float32 and y_tr.dtype == np.int32
        # reference normalization: (x/255 - 0.1307) / 0.3081
        expect = ((x_raw.astype(np.float32) / 255.0) - 0.1307) / 0.3081
        np.testing.assert_allclose(x_tr[:, 0], expect, rtol=1e-6)
        np.testing.assert_array_equal(y_tr, y_raw.astype(np.int32))

    def test_cifar10_npz_channel_normalization(self, tmp_path):
        import numpy as np

        from bayesian_torch_tpu.examples._data import load_cifar10

        rs = np.random.RandomState(1)
        x_tr = rs.randint(0, 256, (16, 3, 32, 32), dtype=np.uint8)
        y_tr = rs.randint(0, 10, 16).astype(np.int64)
        np.savez(tmp_path / "cifar10.npz", x_train=x_tr, y_train=y_tr,
                 x_test=x_tr[:4], y_test=y_tr[:4])
        (xt, yt), _ = load_cifar10(data_dir=str(tmp_path))
        assert xt.shape == (16, 3, 32, 32) and xt.dtype == np.float32
        mean = np.array([0.4914, 0.4822, 0.4465], np.float32)
        std = np.array([0.2470, 0.2435, 0.2616], np.float32)
        expect = (x_tr.astype(np.float32) / 255.0
                  - mean.reshape(1, 3, 1, 1)) / std.reshape(1, 3, 1, 1)
        np.testing.assert_allclose(xt, expect, rtol=1e-5)

    def test_prenormalized_float_npz_passthrough(self, tmp_path):
        """Already-float npz (max <= 2.0) skips the /255 — the contract
        for users exporting normalized arrays."""
        import numpy as np

        from bayesian_torch_tpu.examples._data import load_mnist

        x = np.random.RandomState(2).rand(8, 1, 28, 28).astype(np.float32)
        y = np.zeros(8, np.int64)
        np.savez(tmp_path / "mnist.npz", x_train=x, y_train=y,
                 x_test=x, y_test=y)
        (xt, _), _ = load_mnist(data_dir=str(tmp_path))
        expect = (x.reshape(8, 1, 28, 28) - 0.1307) / 0.3081
        np.testing.assert_allclose(xt, expect, rtol=1e-6)

    def test_missing_npz_falls_back_to_synthetic(self, tmp_path):
        from bayesian_torch_tpu.examples._data import load_mnist

        (x_tr, y_tr), _ = load_mnist(data_dir=str(tmp_path))  # no file
        assert x_tr.shape[1:] == (1, 28, 28)
        assert x_tr.shape[0] > 0

    def test_imagenet_val_npz(self, tmp_path):
        import numpy as np

        from bayesian_torch_tpu.examples._data import load_imagenet_val

        x = np.random.RandomState(3).rand(4, 3, 64, 64).astype(np.float32)
        y = np.arange(4).astype(np.int64)
        np.savez(tmp_path / "imagenet_val.npz", x=x, y=y)
        xo, yo = load_imagenet_val(data_dir=str(tmp_path))
        np.testing.assert_allclose(xo, x)
        assert yo.dtype == np.int32
