"""Statistical checks for the fused counter-hash Rademacher generator.

``rademacher_fused`` replaces rng-bit-generator draws on the Flipout hot
path (profiled at ~28% of the step). It must be distributionally
indistinguishable from iid +-1 for the Flipout estimator to stay
unbiased: unbiased signs, no correlation across positions, keys, or
between the sign tensor and a shifted copy of itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_torch_tpu.ops.sampling import rademacher_fused

N = 1 << 16  # 65536 draws; std of the mean = 1/256 ~ 0.0039


def _signs(key, shape=(N,), dtype=jnp.float32):
    return np.asarray(rademacher_fused(key, shape, dtype))


def test_values_are_signs():
    s = _signs(jax.random.key(0))
    assert set(np.unique(s)) == {-1.0, 1.0}


def test_unbiased():
    s = _signs(jax.random.key(1))
    # |mean| < 5 std of the mean
    assert abs(s.mean()) < 5.0 / np.sqrt(N)


def test_no_serial_correlation():
    s = _signs(jax.random.key(2))
    for lag in (1, 2, 7, 128):
        corr = (s[:-lag] * s[lag:]).mean()
        assert abs(corr) < 5.0 / np.sqrt(N - lag), (lag, corr)


def test_independent_across_keys():
    a = _signs(jax.random.key(3))
    b = _signs(jax.random.key(4))
    assert abs((a * b).mean()) < 5.0 / np.sqrt(N)
    assert not np.array_equal(a, b)


def test_deterministic_per_key():
    a = _signs(jax.random.key(5))
    b = _signs(jax.random.key(5))
    np.testing.assert_array_equal(a, b)


def test_vmap_gives_distinct_streams():
    keys = jax.random.split(jax.random.key(6), 4)
    s = jax.vmap(lambda k: rademacher_fused(k, (N,)))(keys)
    s = np.asarray(s)
    for i in range(4):
        for j in range(i + 1, 4):
            assert abs((s[i] * s[j]).mean()) < 5.0 / np.sqrt(N), (i, j)


def test_rbg_keys_supported():
    # the bench path uses impl='rbg' noise keys (4-word key data)
    k = jax.random.key(7, impl="rbg")
    s = _signs(k)
    assert abs(s.mean()) < 5.0 / np.sqrt(N)


def test_shapes_and_dtype():
    s = rademacher_fused(jax.random.key(8), (3, 5, 7), jnp.bfloat16)
    assert s.shape == (3, 5, 7)
    assert s.dtype == jnp.bfloat16


@pytest.mark.parametrize("block", [64])
def test_block_means_gaussian(block):
    """Sums of disjoint blocks should look N(0, block): a chi-square-ish
    sanity check that catches striping/periodicity the mean test misses."""
    s = _signs(jax.random.key(9)).reshape(-1, block)
    z = s.sum(axis=1) / np.sqrt(block)
    assert abs(z.mean()) < 5.0 / np.sqrt(z.shape[0])
    assert abs(z.var() - 1.0) < 0.1


class TestNormalFused:
    """Counter-hash Box-Muller generator (pure elementwise: identical
    on CPU and TPU, unlike the hardware-PRNG Pallas paths)."""

    def test_moments(self):
        import jax

        from bayesian_torch_tpu.ops.sampling import normal_fused

        z = np.asarray(normal_fused(jax.random.key(0), (1 << 18,)))
        assert abs(z.mean()) < 0.01
        assert abs(z.std() - 1.0) < 0.01
        assert abs(((z - z.mean()) ** 3).mean()) < 0.05
        assert abs(((z - z.mean()) ** 4).mean() - 3.0) < 0.15

    def test_normality_ks(self):
        import jax
        from scipy import stats

        from bayesian_torch_tpu.ops.sampling import normal_fused

        z = np.asarray(normal_fused(jax.random.key(3), (1 << 14,)))
        _, p = stats.kstest(z, "norm")
        assert p > 1e-3, p

    def test_key_independence_and_determinism(self):
        import jax

        from bayesian_torch_tpu.ops.sampling import normal_fused

        a = np.asarray(normal_fused(jax.random.key(1), (4096,)))
        a2 = np.asarray(normal_fused(jax.random.key(1), (4096,)))
        b = np.asarray(normal_fused(jax.random.key(2), (4096,)))
        np.testing.assert_array_equal(a, a2)
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.05
