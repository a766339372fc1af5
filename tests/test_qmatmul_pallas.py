"""K4 fused int8 GEMM+requant kernel (ops/pallas/qmatmul.py).

CPU (interpret mode) checks the algebra exactly — the kernel draws no
randomness, so interpret-mode results are bit-meaningful. The TPU lane
(tests/test_tpu_hw.py) re-checks on real hardware against the XLA path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_torch_tpu.ops import int8 as q


@pytest.fixture(autouse=True)
def _force_pallas():
    old = q.USE_PALLAS_QMATMUL
    q.USE_PALLAS_QMATMUL = True
    yield
    q.USE_PALLAS_QMATMUL = old


def _xla_qlinear(xq, xs, xzp, wq, ws, b, os_, ozp):
    old = q.USE_PALLAS_QMATMUL
    q.USE_PALLAS_QMATMUL = False
    try:
        return np.asarray(q.qlinear(xq, xs, xzp, wq, ws, b, os_, ozp))
    finally:
        q.USE_PALLAS_QMATMUL = old


@pytest.mark.parametrize("M,K,N,xzp", [(16, 32, 24, 128), (70, 100, 30, 117),
                                       (8, 256, 512, 140)])
def test_qmatmul_matches_xla_qlinear(M, K, N, xzp):
    rs = np.random.RandomState(0)
    x = rs.randn(M, K).astype(np.float32)
    w = (rs.randn(N, K) * 0.4).astype(np.float32)
    b = rs.randn(N).astype(np.float32)
    ws = float(q.symmetric_scale(jnp.asarray(w)))
    xq = q.quantize_uint8(jnp.asarray(x), 0.05, xzp)
    wq = q.quantize_int8(jnp.asarray(w), ws)

    got = np.asarray(q.qlinear(xq, 0.05, xzp, wq, ws, jnp.asarray(b),
                               0.1, 128))
    ref = _xla_qlinear(xq, 0.05, xzp, wq, ws, jnp.asarray(b), 0.1, 128)
    # identical math; float assoc in the folded epilogue may flip
    # round-half cases by one quantum
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    assert (got != ref).mean() < 0.02


def test_qmatmul_no_bias():
    rs = np.random.RandomState(1)
    x = rs.randn(12, 40).astype(np.float32)
    w = (rs.randn(20, 40) * 0.4).astype(np.float32)
    ws = float(q.symmetric_scale(jnp.asarray(w)))
    xq = q.quantize_uint8(jnp.asarray(x), 0.05, 128)
    wq = q.quantize_int8(jnp.asarray(w), ws)
    got = np.asarray(q.qlinear(xq, 0.05, 128, wq, ws, None, 0.1, 128))
    ref = _xla_qlinear(xq, 0.05, 128, wq, ws, None, 0.1, 128)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_qconv_1x1_nhwc_routes_to_pallas_and_matches():
    rs = np.random.RandomState(2)
    x = rs.randn(2, 8, 8, 32).astype(np.float32)
    w = (rs.randn(48, 32, 1, 1) * 0.3).astype(np.float32)
    b = rs.randn(48).astype(np.float32)
    ws = float(q.symmetric_scale(jnp.asarray(w)))
    xq = q.quantize_uint8(jnp.asarray(x), 0.05, 120)
    wq = q.quantize_int8(jnp.asarray(w), ws)

    def run():
        return np.asarray(q.qconv(xq, 0.05, 120, wq, ws, jnp.asarray(b),
                                  0.1, 128, stride=2, padding=0,
                                  data_format="NHWC"))

    got = run()
    assert got.shape == (2, 4, 4, 48)
    q.USE_PALLAS_QMATMUL = False
    ref = run()
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_qconv_3x3_still_xla_path():
    """Spatial convs must NOT route through the GEMM kernel."""
    rs = np.random.RandomState(3)
    x = rs.randn(1, 6, 6, 8).astype(np.float32)
    w = (rs.randn(8, 8, 3, 3) * 0.3).astype(np.float32)
    ws = float(q.symmetric_scale(jnp.asarray(w)))
    xq = q.quantize_uint8(jnp.asarray(x), 0.05, 128)
    wq = q.quantize_int8(jnp.asarray(w), ws)
    got = np.asarray(q.qconv(xq, 0.05, 128, wq, ws, None, 0.1, 128,
                             stride=1, padding=1, data_format="NHWC"))
    q.USE_PALLAS_QMATMUL = False
    ref = np.asarray(q.qconv(xq, 0.05, 128, wq, ws, None, 0.1, 128,
                             stride=1, padding=1, data_format="NHWC"))
    np.testing.assert_array_equal(got, ref)
