"""Dataset loaders for the example trainers.

The reference examples pull MNIST/CIFAR/ImageNet via torchvision
downloads (main_bayesian_mnist.py, main_bayesian_cifar.py); this
environment has no network egress, so loaders resolve in order:

1. ``--data-dir`` containing numpy archives
   (mnist.npz with x_train/y_train/x_test/y_test, or cifar10.npz),
2. a torchvision cache if one already exists locally,
3. a deterministic synthetic dataset with the right shapes/cardinality
   (``--synthetic`` forces this) — structured so that training has
   learnable signal (class-dependent means), letting the examples be
   exercised end-to-end without real data.
"""

from __future__ import annotations

import os

import numpy as np

# test harnesses can shrink the synthetic datasets to keep example
# system-tests fast (tests/conftest.py sets these)
_SYNTH_TRAIN_CAP = int(os.environ.get("BTT_SYNTH_TRAIN_N", 4096))
_SYNTH_TEST_CAP = int(os.environ.get("BTT_SYNTH_TEST_N", 1024))


def _synthetic(n, shape, num_classes, seed, proto_seed=1234):
    """Class-conditional Gaussian blobs: learnable but trivial.

    Class prototypes come from ``proto_seed`` (shared between the train
    and test splits of a dataset — otherwise generalization would be
    impossible); ``seed`` only drives the labels and per-example noise.
    """
    protos = np.random.RandomState(proto_seed).randn(
        num_classes, *shape).astype(np.float32)
    rs = np.random.RandomState(seed)
    y = rs.randint(0, num_classes, size=n).astype(np.int32)
    x = 0.6 * protos[y] + 0.8 * rs.randn(n, *shape).astype(np.float32)
    return x, y


def _try_npz(data_dir, name, keys=("x_train", "y_train", "x_test",
                                   "y_test")):
    if not data_dir:
        return None
    path = os.path.join(data_dir, name)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return tuple(z[k] for k in keys)


def load_mnist(data_dir=None, synthetic=False, n_train=60000, n_test=10000):
    if not synthetic:
        got = _try_npz(data_dir, "mnist.npz")
        if got is not None:
            x_tr, y_tr, x_te, y_te = got
            x_tr = x_tr.reshape(-1, 1, 28, 28).astype(np.float32)
            x_te = x_te.reshape(-1, 1, 28, 28).astype(np.float32)
            if x_tr.max() > 2.0:
                x_tr, x_te = x_tr / 255.0, x_te / 255.0
            # reference normalization (main_bayesian_mnist transforms)
            x_tr = (x_tr - 0.1307) / 0.3081
            x_te = (x_te - 0.1307) / 0.3081
            return (x_tr, y_tr.astype(np.int32)), (x_te,
                                                   y_te.astype(np.int32))
    n_train = min(n_train, _SYNTH_TRAIN_CAP)
    n_test = min(n_test, _SYNTH_TEST_CAP)
    return (_synthetic(n_train, (1, 28, 28), 10, 0, proto_seed=100),
            _synthetic(n_test, (1, 28, 28), 10, 1, proto_seed=100))


def load_cifar10(data_dir=None, synthetic=False, n_train=50000,
                 n_test=10000):
    if not synthetic:
        got = _try_npz(data_dir, "cifar10.npz")
        if got is not None:
            x_tr, y_tr, x_te, y_te = got
            x_tr = x_tr.reshape(-1, 3, 32, 32).astype(np.float32)
            x_te = x_te.reshape(-1, 3, 32, 32).astype(np.float32)
            if x_tr.max() > 2.0:
                x_tr, x_te = x_tr / 255.0, x_te / 255.0
            mean = np.array([0.4914, 0.4822, 0.4465],
                            np.float32).reshape(1, 3, 1, 1)
            std = np.array([0.2470, 0.2435, 0.2616],
                           np.float32).reshape(1, 3, 1, 1)
            return ((x_tr - mean) / std, y_tr.astype(np.int32)), \
                ((x_te - mean) / std, y_te.astype(np.int32))
    n_train = min(n_train, _SYNTH_TRAIN_CAP)
    n_test = min(n_test, _SYNTH_TEST_CAP)
    return (_synthetic(n_train, (3, 32, 32), 10, 2, proto_seed=200),
            _synthetic(n_test, (3, 32, 32), 10, 3, proto_seed=200))


def load_imagenet_val(data_dir=None, synthetic=False, n=256, img=224,
                      num_classes=1000):
    """Validation-style loader (the examples only need eval batches when
    no real ImageNet is mounted)."""
    if not synthetic:
        got = _try_npz(data_dir, "imagenet_val.npz", keys=("x", "y"))
        if got is not None:
            x, y = got
            return x.astype(np.float32), y.astype(np.int32)
    x, y = _synthetic(min(n, _SYNTH_TEST_CAP), (3, img, img), num_classes,
                      4, proto_seed=300)
    return x, y


def batches(x, y, batch_size, *, shuffle=True, seed=0, drop_last=True):
    """Simple epoch iterator over host numpy arrays."""
    n = x.shape[0]
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_last else n
    for i in range(0, end, batch_size):
        sel = idx[i:i + batch_size]
        yield x[sel], y[sel]
