"""torch-semantics parity of conv_nd / conv_transpose_nd against torch.nn.functional."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_torch_tpu.ops.conv import conv_nd, conv_transpose_nd

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.5


CONV_CASES = [
    # (nd, in_ch, out_ch, k, stride, padding, dilation, groups)
    (1, 4, 6, 3, 1, 0, 1, 1),
    (1, 4, 6, 5, 2, 2, 1, 2),
    (2, 3, 8, 3, 1, 1, 1, 1),
    (2, 4, 8, (3, 5), 2, (1, 2), 1, 1),
    (2, 6, 6, 3, 1, 1, 2, 3),
    (3, 2, 4, 3, 1, 1, 1, 1),
    (3, 4, 4, (2, 3, 2), (1, 2, 1), 1, 1, 2),
]


@pytest.mark.parametrize("nd,ci,co,k,s,p,d,g", CONV_CASES)
def test_conv_matches_torch(nd, ci, co, k, s, p, d, g):
    kt = (k,) * nd if isinstance(k, int) else k
    x = _rand((2, ci) + (10,) * nd, 0)
    w = _rand((co, ci // g) + kt, 1)
    b = _rand((co,), 2)

    ours = conv_nd(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                   stride=s, padding=p, dilation=d, groups=g)
    fn = {1: F.conv1d, 2: F.conv2d, 3: F.conv3d}[nd]
    ref = fn(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
             stride=s, padding=p, dilation=d, groups=g)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("nd", [1, 2, 3])
def test_pointwise_dot_emission_matches_torch(nd):
    """pointwise_dot=True (1x1 conv as channel dot, det nn-module
    default on channels-last) must be numerically interchangeable with
    the conv emission and the torch oracle."""
    ci, co = 6, 8
    x = _rand((2, ci) + (10,) * nd, 0)
    w = _rand((co, ci) + (1,) * nd, 1)
    b = _rand((co,), 2)
    perm = (0,) + tuple(range(2, 2 + nd)) + (1,)
    x_cl = jnp.transpose(jnp.asarray(x), perm)

    dot = conv_nd(x_cl, jnp.asarray(w), jnp.asarray(b),
                  data_format="N" + "DHW"[3 - nd:] + "C",
                  pointwise_dot=True)
    conv = conv_nd(x_cl, jnp.asarray(w), jnp.asarray(b),
                   data_format="N" + "DHW"[3 - nd:] + "C",
                   pointwise_dot=False)
    fn = {1: F.conv1d, 2: F.conv2d, 3: F.conv3d}[nd]
    ref = fn(torch.from_numpy(x), torch.from_numpy(w),
             torch.from_numpy(b))
    ref_cl = np.transpose(ref.numpy(), perm)
    np.testing.assert_allclose(np.asarray(dot), ref_cl, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dot), np.asarray(conv),
                               rtol=1e-5, atol=1e-5)


def test_pointwise_dot_gates():
    """The dot emission must NOT engage for strided / padded / grouped /
    NCHW / k>1 cases — those keep exact conv semantics."""
    from bayesian_torch_tpu.ops.conv import _is_pointwise

    w11 = jnp.zeros((8, 4, 1, 1))
    ok = ((1, 1), [(0, 0), (0, 0)], (1, 1))
    assert _is_pointwise(w11, ok[0], ok[1], ok[2], 1, "NHWC", True)
    assert not _is_pointwise(w11, (2, 2), ok[1], ok[2], 1, "NHWC", True)
    assert not _is_pointwise(w11, ok[0], [(1, 1), (1, 1)], ok[2], 1,
                             "NHWC", True)
    assert not _is_pointwise(w11, ok[0], ok[1], ok[2], 2, "NHWC", True)
    assert not _is_pointwise(w11, ok[0], ok[1], ok[2], 1, "NCHW", True)
    assert not _is_pointwise(jnp.zeros((8, 4, 3, 3)), ok[0], ok[1],
                             ok[2], 1, "NHWC", True)
    assert not _is_pointwise(w11, ok[0], ok[1], ok[2], 1, "NHWC", False)
    # shape-set restriction
    assert _is_pointwise(w11, ok[0], ok[1], ok[2], 1, "NHWC", {(4, 8)})
    assert not _is_pointwise(w11, ok[0], ok[1], ok[2], 1, "NHWC",
                             {(8, 4)})


CONVT_CASES = [
    # (nd, in_ch, out_ch, k, stride, padding, output_padding, dilation, groups)
    (1, 4, 6, 3, 1, 0, 0, 1, 1),
    (1, 6, 4, 4, 2, 1, 1, 1, 2),
    (2, 3, 5, 3, 2, 1, 1, 1, 1),
    (2, 4, 8, (3, 5), (2, 3), (1, 2), (1, 2), 1, 1),
    (2, 6, 6, 3, 2, 0, 1, 2, 3),
    (3, 2, 4, 3, 2, 1, 1, 1, 1),
]


@pytest.mark.parametrize("nd,ci,co,k,s,p,op,d,g", CONVT_CASES)
def test_conv_transpose_matches_torch(nd, ci, co, k, s, p, op, d, g):
    kt = (k,) * nd if isinstance(k, int) else k
    x = _rand((2, ci) + (7,) * nd, 3)
    w = _rand((ci, co // g) + kt, 4)
    b = _rand((co,), 5)

    ours = conv_transpose_nd(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride=s, padding=p, output_padding=op,
                             dilation=d, groups=g)
    fn = {1: F.conv_transpose1d, 2: F.conv_transpose2d,
          3: F.conv_transpose3d}[nd]
    ref = fn(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
             stride=s, padding=p, output_padding=op, dilation=d, groups=g)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)
