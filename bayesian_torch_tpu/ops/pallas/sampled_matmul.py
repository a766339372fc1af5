"""K1 proper: fused sample-then-GEMM — the sampled weight matrix never
exists in HBM.

Computes ``out = x @ (mu + softplus(rho) * eps)^T`` where eps ~ N(0,1)
is drawn INSIDE the matmul's K-loop with the TPU's hardware PRNG, one
(N-tile, K-tile) block at a time. The reference materializes the full
sampled weight every forward (linear_variational.py:160-178); the XLA
path materializes it once per MC draw; here it only ever lives in VMEM
as a (bn, bk) tile.

Determinism contract: eps for weight element (n, k) is a pure function
of (seed, n-tile, k-tile, position) — independent of the M grid index —
so every output row sees the same sampled W, and the backward pass can
regenerate exactly the same eps instead of storing anything:

    dX     = g @ W            (W regenerated tile-by-tile)
    dmu    = g^T @ x
    dsigma = (g^T @ x) * eps  (eps regenerated inside the same kernel)

Gradient wrt rho chains through sigma = softplus(rho) in XLA.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * math.pi
_U24 = 1.0 / (1 << 24)

_BM = 256
_BN = 256
_BK = 256


def _tile_normals(shape):
    """Box-Muller normals (sin/cos-paired) for one weight tile."""
    half = shape[:-2] + (shape[-2] // 2, shape[-1])
    b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * _U24 + (_U24 * 0.5)
    u2 = i2.astype(jnp.float32) * _U24
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                           axis=-2)


def _seed_for(seed_ref, n_idx, k_idx, nk):
    # eps depends only on (seed, n-tile, k-tile): all M tiles see the
    # same sampled weights
    return seed_ref[0] + n_idx * nk + k_idx


def _fwd_kernel(seed_ref, x_ref, mu_ref, sigma_ref, out_ref, acc_ref):
    """grid (M/bm, N/bn, K/bk): k innermost accumulation."""
    k = pl.program_id(2)
    pltpu.prng_seed(_seed_for(seed_ref, pl.program_id(1), k,
                              pl.num_programs(2)))

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    eps = _tile_normals(mu_ref.shape)
    w = mu_ref[:] + sigma_ref[:] * eps  # (bn, bk), VMEM-only
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _dx_kernel(seed_ref, g_ref, mu_ref, sigma_ref, out_ref, acc_ref):
    """dX[M,K] = g[M,N] @ W[N,K]; grid (M/bm, K/bk, N/bn), n innermost.

    The weight tile is regenerated with the SAME (n, k) seeding as the
    forward (here grid dims are permuted, so n = program_id(2),
    k = program_id(1), and nk = forward's K-tile count)."""
    n = pl.program_id(2)
    k = pl.program_id(1)
    pltpu.prng_seed(_seed_for(seed_ref, n, k, pl.num_programs(1)))

    @pl.when(n == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    eps = _tile_normals(mu_ref.shape)
    w = mu_ref[:] + sigma_ref[:] * eps  # (bn, bk)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(n == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _dw_kernel(seed_ref, g_ref, x_ref, dmu_ref, dsigma_ref,
               dmu_acc, dsig_acc):
    """dmu[N,K] = g^T @ x, dsigma = dmu * eps; grid (N/bn, K/bk, M/bm)."""
    m = pl.program_id(2)
    pltpu.prng_seed(_seed_for(seed_ref, pl.program_id(0), pl.program_id(1),
                              pl.num_programs(1)))

    @pl.when(m == 0)
    def _():
        dmu_acc[:] = jnp.zeros_like(dmu_acc)

    dmu_acc[:] += jax.lax.dot_general(
        g_ref[:], x_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(m == pl.num_programs(2) - 1)
    def _():
        eps = _tile_normals(dmu_acc.shape)
        dmu_ref[:] = dmu_acc[:]
        dsigma_ref[:] = dmu_acc[:] * eps


def _interp():
    return (pltpu.InterpretParams()
            if jax.default_backend() != "tpu" else False)


def _pad2(a, bm, bn):
    m, n = a.shape
    pm, pn = pl.cdiv(m, bm) * bm, pl.cdiv(n, bn) * bn
    if (pm, pn) != (m, n):
        a = jnp.pad(a, ((0, pm - m), (0, pn - n)))
    return a


def _key_to_seed(key):
    return jax.random.key_data(key).reshape(-1)[-1].astype(jnp.int32)


def sampled_matmul_pallas(key, x, mu, rho, *, out_dtype=None):
    """out = x @ (mu + softplus(rho) * eps)^T, eps drawn in-kernel.

    ``x``: (M, K); ``mu``/``rho``: (N, K) torch-layout weights. Returns
    (M, N). Differentiable wrt x, mu, rho (regenerate-eps custom VJP).
    The sampled weight never exists outside VMEM tiles.

    Composes with ``vmap`` over (key, x) — e.g. the MC axis of
    ``parallel.mc_forward`` — and with reverse-mode AD in any order:
    the op is a ``custom_vjp`` whose forward AND backward passes are
    each ``custom_vmap``-wrapped, so under vmap every pass dispatches
    ONE S-batched kernel (grid gains a leading MC dimension, one seed
    per lane) instead of failing on the pallas_call batching rule.
    vmap over mu/rho (an ensemble of posteriors) is not supported.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    seed = _key_to_seed(key)
    sigma = jax.nn.softplus(rho.astype(jnp.float32))
    return _sampled_matmul(seed, x, mu.astype(jnp.float32), sigma,
                           jnp.dtype(out_dtype))


def sampled_matmul_pallas_batched(keys, x, mu, rho, *, out_dtype=None):
    """Explicit S-batched form: ``keys`` (S,), ``x`` (S, M, K) or
    (M, K) shared across draws; returns (S, M, N) with an independent
    weight draw per lane. Lane ``s`` of the output equals
    ``sampled_matmul_pallas(keys[s], x[s], mu, rho)`` exactly (same
    per-tile seeding); one kernel computes all draws."""
    if x.ndim == 2:
        x = jnp.broadcast_to(x[None], (keys.shape[0],) + x.shape)
    return jax.vmap(
        lambda k, xx: sampled_matmul_pallas(k, xx, mu, rho,
                                            out_dtype=out_dtype))(keys, x)


_CV_FORWARD_CACHE = {}


def _cv_forward(out_dtype):
    """custom_vmap wrapper over the forward pallas call: outside vmap
    it is the plain 2D kernel; under vmap (the MC axis) it dispatches
    the single S-batched kernel. AD never differentiates through this
    wrapper — the custom_vjp sits OUTSIDE it."""
    fn = _CV_FORWARD_CACHE.get(out_dtype)
    if fn is not None:
        return fn

    @jax.custom_batching.custom_vmap
    def fwd(seed, x, mu, sigma):
        return _forward(seed, x, mu, sigma, out_dtype)

    @fwd.def_vmap
    def _rule(axis_size, in_batched, seed, x, mu, sigma):
        seed_b, x_b, mu_b, sigma_b = in_batched
        if mu_b or sigma_b:
            raise NotImplementedError(
                "sampled_matmul_pallas: vmap over mu/rho (posterior "
                "ensembles) is not supported — only over (key, x), the "
                "MC-sample axis.")
        if not seed_b:
            seed = jnp.broadcast_to(seed, (axis_size,))
        if not x_b:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        return _forward_s(seed, x, mu, sigma, out_dtype), True

    _CV_FORWARD_CACHE[out_dtype] = fwd
    return fwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sampled_matmul(seed, x, mu, sigma, out_dtype):
    return _cv_forward(out_dtype)(seed, x, mu, sigma)


def _forward(seed, x, mu, sigma, out_dtype):
    M, K = x.shape
    N = mu.shape[0]
    xp = _pad2(x.astype(jnp.float32), _BM, _BK)
    mup = _pad2(mu, _BN, _BK)
    sigp = _pad2(sigma, _BN, _BK)
    Mp, Kp = xp.shape
    Np = mup.shape[0]
    grid = (Mp // _BM, Np // _BN, Kp // _BK)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BM, _BK), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda m, n, k: (n, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda m, n, k: (n, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, _BN), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((_BM, _BN), jnp.float32)],
        interpret=_interp(),
    )(jnp.asarray([seed], jnp.int32), xp, mup, sigp)
    return out[:M, :N]


def _dx_unbatched(seed, g, mu, sigma):
    """dX = g @ W (W regenerated), 2D case."""
    M = g.shape[0]
    K = mu.shape[1]
    gp = _pad2(g, _BM, _BN)
    mup = _pad2(mu, _BN, _BK)
    sigp = _pad2(sigma, _BN, _BK)
    Mp, Np = gp.shape
    Kp = mup.shape[1]
    return pl.pallas_call(
        _dx_kernel,
        grid=(Mp // _BM, Kp // _BK, Np // _BN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BM, _BN), lambda m, k, n: (m, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda m, k, n: (n, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda m, k, n: (n, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, _BK), lambda m, k, n: (m, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BM, _BK), jnp.float32)],
        interpret=_interp(),
    )(jnp.asarray([seed], jnp.int32), gp, mup, sigp)[:M, :K]


def _dw_unbatched(seed, g, x):
    """dmu = g^T @ x, dsigma = dmu * eps (eps regenerated), 2D case."""
    N = g.shape[1]
    K = x.shape[1]
    gp = _pad2(g, _BM, _BN)
    xp = _pad2(x, _BM, _BK)
    Mp, Np = gp.shape
    Kp = xp.shape[1]
    dmu, dsigma = pl.pallas_call(
        _dw_kernel,
        grid=(Np // _BN, Kp // _BK, Mp // _BM),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BM, _BN), lambda n, k, m: (m, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, _BK), lambda n, k, m: (m, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BN, _BK), lambda n, k, m: (n, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda n, k, m: (n, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Np, Kp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_BN, _BK), jnp.float32),
                        pltpu.VMEM((_BN, _BK), jnp.float32)],
        interpret=_interp(),
    )(jnp.asarray([seed], jnp.int32), gp, xp)
    return dmu[:N, :K], dsigma[:N, :K]


@jax.custom_batching.custom_vmap
def _cv_dx(seed, g, mu, sigma):
    return _dx_unbatched(seed, g, mu, sigma)


@_cv_dx.def_vmap
def _cv_dx_rule(axis_size, in_batched, seed, g, mu, sigma):
    seed_b, g_b, mu_b, sigma_b = in_batched
    if mu_b or sigma_b:
        raise NotImplementedError(
            "sampled_matmul_pallas backward: vmap over mu/rho is not "
            "supported — only the MC-sample axis.")
    if not seed_b:
        seed = jnp.broadcast_to(seed, (axis_size,))
    if not g_b:
        g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
    return _dx_s(seed, g, mu, sigma), True


@jax.custom_batching.custom_vmap
def _cv_dw(seed, g, x):
    return _dw_unbatched(seed, g, x)


@_cv_dw.def_vmap
def _cv_dw_rule(axis_size, in_batched, seed, g, x):
    # per-lane (dmu_s, dsigma_s): vmap's transpose machinery sums over
    # the MC axis where the primal (mu/sigma) was broadcast
    seed_b, g_b, x_b = in_batched
    if not seed_b:
        seed = jnp.broadcast_to(seed, (axis_size,))
    if not g_b:
        g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
    if not x_b:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    dmu, dsigma = _dw_s(seed, g, x)
    return (dmu, dsigma), (True, True)


def _bwd(out_dtype, res, g):
    seed, x, mu, sigma = res
    g32 = g.astype(jnp.float32)
    dx = _cv_dx(seed, g32, mu, sigma)
    dmu, dsigma = _cv_dw(seed, g32, x.astype(jnp.float32))
    return None, dx.astype(x.dtype), dmu, dsigma


def _vjp_fwd2(seed, x, mu, sigma, out_dtype):
    out = _cv_forward(out_dtype)(seed, x, mu, sigma)
    return out, (seed, x, mu, sigma)


_sampled_matmul.defvjp(_vjp_fwd2, _bwd)


# ---------------------------------------------------------------------------
# S-batched variants: one kernel computes every MC draw. The grid gains a
# leading S dimension and each lane reads its own seed; the per-tile
# seeding formula (seed + n*nK + k) is IDENTICAL to the unbatched kernels,
# so lane s reproduces sampled_matmul_pallas(seeds[s], ...) exactly.
# This is what the custom_vmap rule dispatches for the MC axis.
# ---------------------------------------------------------------------------


def _fwd_kernel_s(seed_ref, x_ref, mu_ref, sigma_ref, out_ref, acc_ref):
    """grid (S, M/bm, N/bn, K/bk): k innermost accumulation."""
    s = pl.program_id(0)
    k = pl.program_id(3)
    pltpu.prng_seed(seed_ref[s] + pl.program_id(2) * pl.num_programs(3) + k)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    eps = _tile_normals(mu_ref.shape)
    w = mu_ref[:] + sigma_ref[:] * eps  # (bn, bk), VMEM-only
    acc_ref[:] += jax.lax.dot_general(
        x_ref[0], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _dx_kernel_s(seed_ref, g_ref, mu_ref, sigma_ref, out_ref, acc_ref):
    """dX[s] = g[s] @ W_s; grid (S, M/bm, K/bk, N/bn), n innermost."""
    s = pl.program_id(0)
    n = pl.program_id(3)
    k = pl.program_id(2)
    pltpu.prng_seed(seed_ref[s] + n * pl.num_programs(2) + k)

    @pl.when(n == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    eps = _tile_normals(mu_ref.shape)
    w = mu_ref[:] + sigma_ref[:] * eps  # (bn, bk)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[0], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(n == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _dw_kernel_s(seed_ref, g_ref, x_ref, dmu_ref, dsigma_ref, acc_ref):
    """Per-lane dmu_s = g_s^T @ x_s, dsigma_s = dmu_s * eps_s;
    grid (S, N/bn, K/bk, M/bm), m innermost. The cross-lane sum (for
    broadcast mu/sigma) is applied by vmap's transpose machinery."""
    s = pl.program_id(0)
    m = pl.program_id(3)

    @pl.when(m == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        g_ref[0], x_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(m == pl.num_programs(3) - 1)
    def _():
        pltpu.prng_seed(seed_ref[s]
                        + pl.program_id(1) * pl.num_programs(2)
                        + pl.program_id(2))
        eps = _tile_normals(acc_ref.shape)
        dmu_ref[0] = acc_ref[:]
        dsigma_ref[0] = acc_ref[:] * eps


def _pad3(a, bm, bn):
    s, m, n = a.shape
    pm, pn = pl.cdiv(m, bm) * bm, pl.cdiv(n, bn) * bn
    if (pm, pn) != (m, n):
        a = jnp.pad(a, ((0, 0), (0, pm - m), (0, pn - n)))
    return a


def _forward_s(seeds, x, mu, sigma, out_dtype):
    S, M, K = x.shape
    N = mu.shape[0]
    xp = _pad3(x.astype(jnp.float32), _BM, _BK)
    mup = _pad2(mu, _BN, _BK)
    sigp = _pad2(sigma, _BN, _BK)
    Mp, Kp = xp.shape[1:]
    Np = mup.shape[0]
    grid = (S, Mp // _BM, Np // _BN, Kp // _BK)
    out = pl.pallas_call(
        _fwd_kernel_s,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BM, _BK), lambda s, m, n, k: (s, m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda s, m, n, k: (n, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda s, m, n, k: (n, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BM, _BN), lambda s, m, n, k: (s, m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((_BM, _BN), jnp.float32)],
        interpret=_interp(),
    )(seeds.astype(jnp.int32), xp, mup, sigp)
    return out[:, :M, :N]


def _dx_s(seeds, g, mu, sigma):
    """Per-lane dX_s = g_s @ W_s; grid (S, M/bm, K/bk, N/bn)."""
    S, M = g.shape[:2]
    K = mu.shape[1]
    gp = _pad3(g, _BM, _BN)
    mup = _pad2(mu, _BN, _BK)
    sigp = _pad2(sigma, _BN, _BK)
    Mp, Np = gp.shape[1:]
    Kp = mup.shape[1]
    return pl.pallas_call(
        _dx_kernel_s,
        grid=(S, Mp // _BM, Kp // _BK, Np // _BN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BM, _BN), lambda s, m, k, n: (s, m, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda s, m, k, n: (n, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, _BK), lambda s, m, k, n: (n, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BM, _BK), lambda s, m, k, n: (s, m, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Mp, Kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BM, _BK), jnp.float32)],
        interpret=_interp(),
    )(seeds.astype(jnp.int32), gp, mup, sigp)[:, :M, :K]


def _dw_s(seeds, g, x):
    """Per-lane (dmu_s, dsigma_s); grid (S, N/bn, K/bk, M/bm)."""
    S = g.shape[0]
    N = g.shape[2]
    K = x.shape[2]
    gp = _pad3(g, _BM, _BN)
    xp = _pad3(x, _BM, _BK)
    Mp, Np = gp.shape[1:]
    Kp = xp.shape[2]
    dmu, dsigma = pl.pallas_call(
        _dw_kernel_s,
        grid=(S, Np // _BN, Kp // _BK, Mp // _BM),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BM, _BN), lambda s, n, k, m: (s, m, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BM, _BK), lambda s, n, k, m: (s, m, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _BN, _BK), lambda s, n, k, m: (s, n, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN, _BK), lambda s, n, k, m: (s, n, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, Np, Kp), jnp.float32),
            jax.ShapeDtypeStruct((S, Np, Kp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_BN, _BK), jnp.float32)],
        interpret=_interp(),
    )(seeds.astype(jnp.int32), gp, xp)
    return dmu[:, :N, :K], dsigma[:, :N, :K]
