"""Base class and shared plumbing for variational layers.

TPU-native counterpart of the reference's ``BaseVariationalLayer_``
(reference: bayesian_torch/layers/base_variational_layer.py:35-68). Key
re-designs:

- Layers are ``flax.nnx`` modules: posterior parameters are ``nnx.Param``
  leaves of a pytree, priors are non-trainable ``Prior`` variables (scalar
  by default, arrays after MOPED init), and weight-noise is drawn from an
  explicit ``nnx.Rngs`` stream rather than an in-place ``eps`` buffer
  (reference idiom: ``self.eps_weight.data.normal_()``,
  linear_variational.py:161).
- ``kl_div`` keeps the reference's exact reduction semantics: the **mean**
  over elements of the closed-form Gaussian KL(Q||P)
  (base_variational_layer.py:53-68), with bias KL *added* (not
  size-weighted).
"""

from __future__ import annotations

import collections.abc
import threading
from itertools import repeat

import jax
import jax.numpy as jnp
from flax import nnx

from bayesian_torch_tpu.ops.kl import gaussian_kl


def get_kernel_size(x, n):
    """Normalize an int-or-iterable kernel spec to an n-tuple.

    Mirrors reference base_variational_layer.py:35-38.
    """
    if isinstance(x, collections.abc.Iterable):
        return tuple(x)
    return tuple(repeat(x, n))


class Presampled(nnx.Variable):
    """Per-MC-draw presampled weights, set transiently by
    parallel.mc.mc_forward's fused-sampler path. Carries a leading MC
    axis outside the vmapped region; mapped (axis 0) inside it."""


class Prior(nnx.Variable):
    """Non-trainable prior parameter (mu or sigma of the Gaussian prior).

    Scalar (0-d) by default; MOPED init replaces the value with a full
    array matching the posterior shape (reference utils/util.py:102-104).
    Excluded from optimizer updates because it is not an ``nnx.Param``.
    """


_default_rngs_lock = threading.Lock()
_default_rngs_seed = [0]


def default_rngs() -> nnx.Rngs:
    """Fresh ``nnx.Rngs`` for layers constructed without explicit rngs.

    The reference's layers are constructible with no RNG argument (torch
    keeps RNG state globally); to preserve that constructor surface each
    no-arg construction draws a new seed from a process-global counter.
    Pass ``rngs=nnx.Rngs(...)`` explicitly for reproducibility.

    The noise stream uses ``rbg`` keys on TPU: the hardware RNG makes
    per-forward weight draws ~2x cheaper than the threefry default
    (measured 7.4 vs 13.1 ms for 10x25.5M draws — BASELINE.md), and
    every example/bench already passes rbg noise keys explicitly.
    """
    with _default_rngs_lock:
        seed = _default_rngs_seed[0]
        _default_rngs_seed[0] += 1
    if jax.default_backend() == "tpu":
        noise = jax.random.key(seed + 0x9E3779B9, impl="rbg")
    else:
        noise = seed + 0x9E3779B9
    return nnx.Rngs(params=seed, noise=noise)


def seed_default_rngs(seed: int) -> None:
    """Reset the process-global seed counter (test determinism helper)."""
    with _default_rngs_lock:
        _default_rngs_seed[0] = seed


def make_rngs(seed: int = 0, *, noise_seed: int | None = None) -> nnx.Rngs:
    """Seeded ``nnx.Rngs`` with the TPU-fast noise stream.

    Like ``nnx.Rngs(params=seed, noise=seed+1)`` but the noise key uses
    the ``rbg`` implementation on TPU (hardware RNG; per-forward weight
    draws measured ~2x cheaper than threefry — BASELINE.md). Use this in
    trainers/benches instead of raw integer seeds.
    """
    if noise_seed is None:
        noise_seed = seed + 1
    if jax.default_backend() == "tpu":
        noise = jax.random.key(noise_seed, impl="rbg")
    else:
        noise = noise_seed
    return nnx.Rngs(params=seed, noise=noise)


class BaseVariationalLayer(nnx.Module):
    """Shared base for all Bayesian layers.

    Provides the ``dnn_to_bnn_flag`` (when True, ``__call__`` returns the
    bare output and KL is collected out-of-band via ``kl_loss()`` /
    ``get_kl_loss``, matching reference dnn_to_bnn.py:157-165) and the
    closed-form Gaussian KL with mean reduction.
    """

    def __init__(self):
        self.dnn_to_bnn_flag = False
        # When False, forward returns kl=0.0 without evaluating the
        # closed-form KL (pure-inference fast path; kl_loss() itself is
        # unaffected). Toggled statically by parallel.mc.mc_forward.
        self.compute_kl = True
        # PTQ calibration mode: set by prepare(); forward then records
        # activation/weight ranges into MinMax observers
        # (reference linear_variational.py:121-129,180-190).
        self.quant_prepare = False

    def _make_observers(self, n_qint: int, n_quint: int, qconfig=None):
        """Build the calibration observer lists. ``qconfig`` is an
        optional QConfig whose ``weight`` factory fills the qint slots
        and ``activation`` factory the quint slots; default is
        per-tensor MinMax like the reference.

        SLOT-MAPPING DIVERGENCE from torch (deliberate, documented): in
        torch, every QuantStub runs its qconfig's *activation* observer
        — the reference's qint stubs are QuantStub(QConfig(activation=
        MinMax(qint8))) (linear_variational.py:123-129), i.e. torch's
        "activation" field is overloaded to configure weight-range
        stubs too. Here the qint slots (which observe *weight-derived*
        tensors: sampled W, sigma, eps) are filled from
        ``qconfig.weight`` and the quint slots (true activations) from
        ``qconfig.activation``, so the two factories mean what their
        names say. A reference QConfig ported verbatim therefore lands
        its observers in different slots than torch would — pass
        ``QConfig(weight=<qint8 factory>, activation=<quint8 factory>)``
        and the harvest order is identical.

        Each constructed observer's dtype is validated against its slot
        class (qint slots need qint8/symmetric qparams, quint slots
        quint8/affine — the quantized kernels consume quant_dict
        positionally with fixed dtype assumptions), so a swapped
        QConfig fails loudly instead of silently mis-quantizing.
        """
        from bayesian_torch_tpu.quantization.observers import MinMaxObserver
        wfac = qconfig.weight if qconfig is not None \
            else MinMaxObserver.with_args(dtype="qint8")
        afac = qconfig.activation if qconfig is not None \
            else MinMaxObserver.with_args(dtype="quint8")
        self.qint_quant = [wfac() for _ in range(n_qint)]
        self.quint_quant = [afac() for _ in range(n_quint)]
        for slot, want, which in ((self.qint_quant, "qint8", "weight"),
                                  (self.quint_quant, "quint8",
                                   "activation")):
            for ob in slot:
                got = getattr(ob, "dtype", None)
                if got != want:
                    raise ValueError(
                        f"QConfig.{which} built a {type(ob).__name__} with "
                        f"dtype={got!r}, but the {want} quant_dict slots "
                        f"require dtype={want!r} (the quantized kernels "
                        f"assume {'symmetric' if want == 'qint8' else 'affine'}"
                        " qparams in these positions)")
        self.quant_prepare = True

    def kl_div(self, mu_q, sigma_q, mu_p, sigma_p):
        """KL(Q||P) between diagonal Gaussians, mean-reduced over elements.

        Same formula and reduction as reference
        base_variational_layer.py:53-68.
        """
        return gaussian_kl(mu_q, sigma_q, mu_p, sigma_p)

    # --- shared posterior/prior construction helpers -------------------

    def _init_posterior(self, rngs: nnx.Rngs, shape, mu_init, rho_init,
                        dtype=jnp.float32):
        """mu ~ N(mu_init, 0.1), rho ~ N(rho_init, 0.1).

        Matches reference init (linear_variational.py:131-142).
        Returns (mu Param, rho Param).
        """
        import jax

        mu = nnx.Param(
            mu_init + 0.1 * jax.random.normal(rngs.params(), shape, dtype))
        rho = nnx.Param(
            rho_init + 0.1 * jax.random.normal(rngs.params(), shape, dtype))
        return mu, rho

    def _init_prior(self, prior_mean, prior_variance, dtype=jnp.float32):
        """Scalar priors; note the reference uses ``prior_variance``
        directly as sigma_p in kl_div (linear_variational.py:132-133 fills
        prior_weight_sigma with prior_variance) — we preserve that
        semantic exactly."""
        return (Prior(jnp.asarray(prior_mean, dtype)),
                Prior(jnp.asarray(prior_variance, dtype)))
