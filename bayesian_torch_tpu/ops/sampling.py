"""Weight-noise sampling primitives.

The reference draws noise by mutating non-persistent buffers in place
(``self.eps_weight.data.normal_()``, linear_variational.py:161). The
TPU-native design threads explicit PRNG keys: every draw is a pure
function of a key, which makes MC-vmap, sharding, and test determinism
(inject a fixed eps) trivial.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sigma_from_rho(rho):
    """sigma = softplus(rho) = log1p(exp(rho)).

    Reference: linear_variational.py:160.
    """
    return jax.nn.softplus(rho)


def log_sigma_from_rho(rho):
    """log(softplus(rho)), stable for very negative rho.

    For rho << 0, softplus(rho) ~= exp(rho) underflows to a subnormal that
    XLA's flush-to-zero turns into 0, making log(sigma) -inf where torch
    (which keeps subnormals) returns ~rho. Branch to the asymptote
    log(softplus(rho)) -> rho for rho < -20 (error < 1e-9 there).
    """
    safe = jnp.where(rho < -20.0, 0.0, rho)
    return jnp.where(rho < -20.0, rho, jnp.log(jax.nn.softplus(safe)))


def squeezed_shape(shape):
    """``shape`` with size-1 dims removed (for generation/elementwise
    iteration spaces; see normal_squeezed)."""
    s = tuple(d for d in shape if d != 1)
    return s if s else (1,)


def normal_squeezed(key, shape, dtype=jnp.float32):
    """N(0,1) draws of ``shape``, GENERATED at the squeezed shape.

    jax.random assigns bits by flat index, so the values are identical
    to ``jax.random.normal(key, shape)`` — but generation fusions at
    degenerate shapes like a 1x1 conv kernel's (S, O, I, 1, 1) run
    ~14x slower on v5e than the same draw count at (S, O, I)
    (benchmarks/bench_gen_shapes.py / bench_r05_flagship.py variant j:
    the RN50 MC-10 presample drops 13.1 -> 3.5 ms). Pure perf; zero
    semantic change.
    """
    s = squeezed_shape(shape)
    if len(s) == len(shape):
        return jax.random.normal(key, shape, dtype)
    return jax.random.normal(key, s, dtype).reshape(shape)


def sample_gaussian_weight(key, mu, rho, eps=None):
    """W = mu + softplus(rho) * eps, eps ~ N(0, I).

    ``eps`` may be injected for golden-value tests (the reference
    equivalently allows presetting the eps buffer).
    Returns (weight, sigma).

    The sampling algebra runs at the SQUEEZED shape (size-1 dims
    removed) when a fresh eps is drawn — see normal_squeezed: identical
    values, ~14x faster generation fusions at 1x1-conv kernel shapes.
    """
    sigma = sigma_from_rho(rho)
    shp = jnp.shape(mu)
    s = squeezed_shape(shp)
    if eps is None and len(s) != len(shp):
        eps_s = jax.random.normal(key, s, dtype=jnp.result_type(mu))
        w = mu.reshape(s) + sigma.reshape(s) * eps_s
        return w.reshape(shp), sigma
    if eps is None:
        eps = jax.random.normal(key, shp, dtype=jnp.result_type(mu))
    return mu + sigma * eps, sigma


def rademacher(key, shape, dtype=jnp.float32):
    """iid signs in {-1, +1}.

    The reference samples ``uniform(-1,1).sign()`` per call
    (linear_flipout.py:169-170); distributionally identical.
    """
    return jax.random.rademacher(key, shape, dtype=dtype)


_SM32_GOLDEN = 0x9E3779B9  # splitmix increment (2^32 / golden ratio)


def _splitmix32(x):
    """splitmix32 finalizer: full-avalanche 32-bit mix (elementwise)."""
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def rademacher_fused(key, shape, dtype=jnp.float32):
    """iid signs in {-1, +1} from a counter-based hash.

    Flipout needs activation-shaped sign tensors every call. Drawing them
    with the TPU RNG op (rng-bit-generator) writes a full uint32 word per
    element to HBM and reads it back in the convert fusion — profiled at
    ~28% of the Flipout ResNet-50 step. Here the sign for flat position i
    is bit 31 of splitmix32(salt + (i+1)*GOLDEN): iota + integer mixes are
    plain elementwise ops that XLA fuses into the consuming multiply, so
    the signs never exist in memory at all.

    Independence across draws comes from the salt, a 32-bit digest of the
    PRNG key; within a draw, splitmix32 is a bijective full-avalanche mix
    whose high bit is unbiased and pairwise-uncorrelated across counters
    (it is exactly the splitmix generator's output stream).
    """
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    salt = data[-1]
    for i in range(data.shape[0] - 1):
        salt = salt * jnp.uint32(_SM32_GOLDEN) ^ data[i]
    n = math.prod(shape)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
    h = _splitmix32(salt + (idx + jnp.uint32(1)) * jnp.uint32(_SM32_GOLDEN))
    one = jnp.ones((), dtype)
    return jnp.where((h >> 31).astype(jnp.bool_), -one, one)


def _key_salt(key):
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    salt = data[-1]
    for i in range(data.shape[0] - 1):
        salt = salt * jnp.uint32(_SM32_GOLDEN) ^ data[i]
    return salt


_U24 = 1.0 / (1 << 24)
_TWO_PI = 2.0 * math.pi


def normal_fused(key, shape, dtype=jnp.float32):
    """iid N(0,1) from a counter-based hash (Box-Muller).

    Same motivation as ``rademacher_fused``: ``jax.random.normal``'s
    rng-bit-generator writes a uint32 word per element to HBM and reads
    it back in the consuming fusion; here the value at flat position i
    is a pure elementwise function of (salt, i) — two splitmix32
    evaluations feeding an unpaired Box-Muller — so XLA fuses the whole
    draw into the consumer and the noise never exists in memory. Used
    on the INT8 weight-sampling path where eps is immediately quantized
    (quantized_base.py); statistical tests in tests/test_sampling.py.
    """
    salt = _key_salt(key)
    n = math.prod(shape)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
    c = (idx + jnp.uint32(1)) * jnp.uint32(_SM32_GOLDEN)
    h1 = _splitmix32(salt + c)
    h2 = _splitmix32((salt ^ jnp.uint32(0xDEADBEEF)) + c)
    # 24-bit uniforms: u1 in (0,1] (avoids log(0)), u2 in [0,1)
    u1 = (h1 >> jnp.uint32(8)).astype(jnp.float32) * _U24 + (_U24 * 0.5)
    u2 = (h2 >> jnp.uint32(8)).astype(jnp.float32) * _U24
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    z = r * jnp.cos(_TWO_PI * u2)
    return z.astype(dtype)
