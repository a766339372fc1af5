"""Error-aligned uncertainty/confidence calibration losses.

TPU-native counterpart of reference
bayesian_torch/utils/uncertainty_calibration_loss.py: EaULoss
(:28-108), EaCLoss (:111-189), and the vectorized AvULoss (:192-261).
The reference vectorizes with nonzero()/index_select/dot (dynamic
shapes, not jittable); here the same sums are computed with masked
reductions, which jit and differentiate on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-10


class EaULoss:
    """Error-aligned Uncertainty loss.

    n_lc = sum over {low error & certain}   of (1-tanh(err))*(1-tanh(unc))
    n_lu = sum over {low error & uncertain} of (1-tanh(err))*tanh(unc)
    n_hc = sum over {high error & certain}  of tanh(err)*(1-tanh(unc))
    n_hu = sum over {high error & uncertain} of tanh(err)*tanh(unc)
    loss = -beta*log((n_lc+n_hu)/(n_lc+n_lu+n_hc+n_hu)+eps)
    (reference uncertainty_calibration_loss.py:61-108)
    """

    def __init__(self, beta=1):
        self.beta = beta
        self.eps = EPS

    def __call__(self, error, unc, error_th, unc_th):
        low = (error <= error_th).astype(unc.dtype)
        cert = (unc <= unc_th).astype(unc.dtype)
        te, tu = jnp.tanh(error), jnp.tanh(unc)
        n_lc = jnp.sum(low * cert * (1 - te) * (1 - tu))
        n_lu = jnp.sum(low * (1 - cert) * (1 - te) * tu)
        n_hc = jnp.sum((1 - low) * cert * te * (1 - tu))
        n_hu = jnp.sum((1 - low) * (1 - cert) * te * tu)
        eau = (n_lc + n_hu) / (n_lc + n_lu + n_hc + n_hu + self.eps)
        return -self.beta * jnp.log(eau + self.eps)

    forward = __call__


class EaCLoss:
    """Error-aligned Confidence loss (certain = conf > conf_th).

    Reference uncertainty_calibration_loss.py:142-189.
    """

    def __init__(self, beta=1):
        self.beta = beta
        self.eps = EPS

    def __call__(self, error, conf, error_th, conf_th):
        low = (error <= error_th).astype(conf.dtype)
        cert = (conf > conf_th).astype(conf.dtype)
        te = jnp.tanh(error)
        n_lc = jnp.sum(low * cert * (1 - te) * conf)
        n_lu = jnp.sum(low * (1 - cert) * (1 - te) * (1 - conf))
        n_hc = jnp.sum((1 - low) * cert * te * conf)
        n_hu = jnp.sum((1 - low) * (1 - cert) * te * (1 - conf))
        eac = (n_lc + n_hu) / (n_lc + n_lu + n_hc + n_hu + self.eps)
        return -self.beta * jnp.log(eac + self.eps)

    forward = __call__


class AvULoss:
    """Vectorized AvU loss (classification), matching the soft counts of
    reference uncertainty_calibration_loss.py:210-261.
    """

    def __init__(self, beta=1):
        self.beta = beta
        self.eps = EPS

    def entropy(self, prob):
        return -jnp.sum(prob * jnp.log(prob + self.eps), axis=-1)

    def __call__(self, logits, labels, unc_th, type=0):
        probs = jax.nn.softmax(logits, axis=1)
        confidences = jnp.max(probs, axis=1)
        predictions = jnp.argmax(probs, axis=1)
        unc = self.entropy(probs)
        acc = (labels == predictions).astype(confidences.dtype)
        cert = (unc <= unc_th).astype(confidences.dtype)
        tu = jnp.tanh(unc)
        n_ac = jnp.sum(acc * cert * confidences * (1 - tu))
        n_au = jnp.sum(acc * (1 - cert) * confidences * tu)
        n_ic = jnp.sum((1 - acc) * cert * (1 - confidences) * (1 - tu))
        n_iu = jnp.sum((1 - acc) * (1 - cert) * (1 - confidences) * tu)
        avu = (n_ac + n_iu) / (n_ac + n_au + n_ic + n_iu + self.eps)
        return -self.beta * jnp.log(avu + self.eps)

    forward = __call__
