"""Accuracy-versus-Uncertainty calibration losses (Krishnan & Tickoo,
NeurIPS 2020).

TPU-native counterpart of reference bayesian_torch/utils/avuc_loss.py.
The reference bins samples with a Python loop over the batch
(avuc_loss.py:127-176) and integrates AvU over 21 thresholds with
sklearn's auc (:310-366); here everything is vectorized with boolean
masks and jnp.trapezoid, so both losses jit and differentiate on TPU
with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-10


def auc(x, y):
    """Trapezoidal area under the curve y(x).

    The reference exposes sklearn's ``auc`` from this module
    (avuc_loss.py:47) and integrates AvU-vs-threshold with it (:268,
    :364); this equivalent is jnp-native so it jits and differentiates.
    Like sklearn's, ``x`` must be sorted (either direction).
    """
    x = jnp.asarray(x)
    area = jnp.trapezoid(jnp.asarray(y), x)
    return jnp.where(x[-1] >= x[0], area, -area)


def _entropy(prob, eps=EPS):
    return -jnp.sum(prob * jnp.log(prob + eps), axis=-1)


def _soft_counts(confidences, accurate, certain, unc):
    """tanh-weighted soft counts of the 4 (accuracy x certainty) bins.

    Mirrors the per-sample weights of reference avuc_loss.py:155-173:
      n_ac += conf * (1 - tanh(u));  n_au += conf * tanh(u)
      n_ic += (1-conf) * (1 - tanh(u));  n_iu += (1-conf) * tanh(u)
    """
    tanh_u = jnp.tanh(unc)
    acc = accurate.astype(unc.dtype)
    cert = certain.astype(unc.dtype)
    n_ac = jnp.sum(acc * cert * confidences * (1 - tanh_u))
    n_au = jnp.sum(acc * (1 - cert) * confidences * tanh_u)
    n_ic = jnp.sum((1 - acc) * cert * (1 - confidences) * (1 - tanh_u))
    n_iu = jnp.sum((1 - acc) * (1 - cert) * (1 - confidences) * tanh_u)
    return n_ac, n_au, n_ic, n_iu


class AvULoss:
    """Accuracy vs Uncertainty loss at a fixed uncertainty threshold.

    Reference: avuc_loss.py:50-176. ``type`` 0 = predictive entropy,
    1 = model uncertainty (mutual information).
    """

    def __init__(self, beta=1):
        self.beta = beta
        self.eps = EPS

    def entropy(self, prob):
        return _entropy(prob, self.eps)

    def expected_entropy(self, mc_preds):
        return jnp.mean(self.entropy(mc_preds), axis=0)

    def predictive_uncertainty(self, mc_preds):
        return self.entropy(jnp.mean(mc_preds, axis=0))

    def model_uncertainty(self, mc_preds):
        return (self.entropy(jnp.mean(mc_preds, axis=0))
                - self.expected_entropy(mc_preds))

    def accuracy_vs_uncertainty(self, prediction, true_label, uncertainty,
                                optimal_threshold):
        """Hard-count AvU metric (reference avuc_loss.py:89-125)."""
        accurate = prediction == true_label
        certain = uncertainty <= optimal_threshold
        acc = accurate.astype(jnp.float32)
        cert = certain.astype(jnp.float32)
        n_ac = jnp.sum(acc * cert)
        n_au = jnp.sum(acc * (1 - cert))
        n_ic = jnp.sum((1 - acc) * cert)
        n_iu = jnp.sum((1 - acc) * (1 - cert))
        return (n_ac + n_iu) / (n_ac + n_au + n_ic + n_iu)

    def __call__(self, logits, labels, optimal_uncertainty_threshold,
                 type=0):
        probs = jax.nn.softmax(logits, axis=1)
        confidences = jnp.max(probs, axis=1)
        predictions = jnp.argmax(probs, axis=1)
        unc = self.entropy(probs) if type == 0 else \
            self.model_uncertainty(probs)
        accurate = labels == predictions
        certain = unc <= optimal_uncertainty_threshold
        n_ac, n_au, n_ic, n_iu = _soft_counts(confidences, accurate,
                                              certain, unc)
        avu = (n_ac + n_iu) / (n_ac + n_au + n_ic + n_iu + self.eps)
        return -self.beta * jnp.log(avu + self.eps)

    forward = __call__


class AUAvULoss:
    """Area under the AvU curve over 21 thresholds spanning [umin, umax].

    Reference: avuc_loss.py:180-366 (sklearn auc -> jnp.trapezoid).
    Returns (loss, auc_avu).
    """

    def __init__(self, beta=1):
        self.beta = beta
        self.eps = EPS

    def entropy(self, prob):
        return _entropy(prob, self.eps)

    def expected_entropy(self, mc_preds):
        return jnp.mean(self.entropy(mc_preds), axis=0)

    def model_uncertainty(self, mc_preds):
        return (self.entropy(jnp.mean(mc_preds, axis=0))
                - self.expected_entropy(mc_preds))

    def __call__(self, logits, labels, type=0):
        probs = jax.nn.softmax(logits, axis=1)
        confidences = jnp.max(probs, axis=1)
        predictions = jnp.argmax(probs, axis=1)
        unc = self.entropy(probs) if type == 0 else \
            self.model_uncertainty(probs)
        accurate = labels == predictions

        th_list = jnp.linspace(0.0, 1.0, 21)
        umin, umax = jnp.min(unc), jnp.max(unc)
        unc_ths = umin + th_list * (umax - umin)

        def avu_at(unc_th):
            certain = unc <= unc_th
            n_ac, n_au, n_ic, n_iu = _soft_counts(confidences, accurate,
                                                  certain, unc)
            return (n_ac + n_iu) / (n_ac + n_au + n_ic + n_iu + self.eps)

        avus = jax.vmap(avu_at)(unc_ths)
        auc_avu = jnp.trapezoid(avus, th_list)
        loss = -self.beta * jnp.log(auc_avu + self.eps)
        return loss, auc_avu

    forward = __call__


def entropy(prob):
    return -1 * np.sum(prob * np.log(prob + 1e-15), axis=-1)


def predictive_entropy(mc_preds):
    return entropy(np.mean(mc_preds, axis=0))


def mutual_information(mc_preds):
    return entropy(np.mean(mc_preds, axis=0)) - np.mean(entropy(mc_preds),
                                                        axis=0)


def eval_avu(pred_label, true_label, uncertainty):
    """AvU at 21 thresholds (numpy metric, reference avuc_loss.py:392-419)."""
    pred_label = np.asarray(pred_label)
    true_label = np.asarray(true_label)
    uncertainty = np.asarray(uncertainty)
    t_list = np.linspace(0, 1, 21)
    umin, umax = uncertainty.min(), uncertainty.max()
    accurate = pred_label == true_label
    avu_list, unc_list = [], []
    for t in t_list:
        u_th = umin + t * (umax - umin)
        certain = uncertainty <= u_th
        n_ac = np.sum(accurate & certain)
        n_au = np.sum(accurate & ~certain)
        n_ic = np.sum(~accurate & certain)
        n_iu = np.sum(~accurate & ~certain)
        avu_list.append((n_ac + n_iu) / (n_ac + n_au + n_ic + n_iu + 1e-15))
        unc_list.append(u_th)
    return np.asarray(avu_list), np.asarray(unc_list)


def accuracy_vs_uncertainty(pred_label, true_label, uncertainty,
                            optimal_threshold):
    """Hard-count AvU metric (reference avuc_loss.py:422-443)."""
    pred_label = np.asarray(pred_label)
    true_label = np.asarray(true_label)
    uncertainty = np.asarray(uncertainty)
    accurate = pred_label == true_label
    certain = uncertainty <= optimal_threshold
    n_ac = np.sum(accurate & certain)
    n_au = np.sum(accurate & ~certain)
    n_ic = np.sum(~accurate & certain)
    n_iu = np.sum(~accurate & ~certain)
    return (n_ac + n_iu) / (n_ac + n_au + n_ic + n_iu)
