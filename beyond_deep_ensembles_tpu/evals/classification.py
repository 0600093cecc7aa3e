"""Shared multiclass-classification evaluation.

Re-implementation of reference experiments/base/multiclass_classification.py
as jittable array functions: the Bayesian model average in log space
(reference :30-31), per-point analysis (:163-176) and the aggregated
EvalResult (:78-109).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .calibration import CalibrationResults


def bayesian_model_average(log_probs: jax.Array) -> jax.Array:
    """Marginal predictive in log space: logsumexp over the sample axis
    minus log S (reference multiclass_classification.py:30-31).

    log_probs: [samples, batch, classes] log-probabilities.
    """
    s = log_probs.shape[0]
    return jax.scipy.special.logsumexp(log_probs, axis=0) - jnp.log(jnp.float32(s))


def analyze_output(log_marginal: jax.Array, target: jax.Array, baseline_log_marginal=None):
    """Per-point correctness / confidence / log-likelihood, plus agreement
    and total variation against a ground-truth posterior (the HMC baseline)
    when given (reference multiclass_classification.py:163-176).
    """
    preds = jnp.argmax(log_marginal, axis=1)
    correct = preds == target
    confidences = jnp.clip(jnp.exp(jnp.max(log_marginal, axis=1)), 0.0, 1.0)
    ll = jnp.take_along_axis(log_marginal, target[:, None], axis=1)[:, 0]

    agreement = None
    total_variation = None
    if baseline_log_marginal is not None:
        agreement = (preds == jnp.argmax(baseline_log_marginal, axis=1)).astype(
            jnp.float32
        )
        total_variation = (
            jnp.sum(jnp.abs(jnp.exp(log_marginal) - jnp.exp(baseline_log_marginal)), axis=1)
            / 2
        )
    return correct, confidences, ll, agreement, total_variation


def binary_to_multiclass(outputs: jax.Array) -> jax.Array:
    """[..., 1] sigmoid probability -> [..., 2] class probabilities
    (reference multiclass_classification.py:178-180)."""
    outputs = outputs[..., 0]
    return jnp.stack([1.0 - outputs, outputs], axis=-1)


class EvalResult(struct.PyTreeNode):
    """Aggregate classification metrics (reference EvalResult,
    multiclass_classification.py:78-109)."""

    accuracy: jax.Array
    avg_log_likelihood: jax.Array
    avg_likelihood: jax.Array
    ece: jax.Array
    signed_ece: jax.Array
    hmc_agreement: jax.Array | None = None
    hmc_total_variation: jax.Array | None = None

    @classmethod
    def create(
        cls,
        correct,
        confidences,
        log_likelihoods,
        bin_count: int = 10,
        agreements=None,
        total_variations=None,
    ) -> "EvalResult":
        calibration = CalibrationResults.create(bin_count, correct, confidences)
        return cls(
            accuracy=jnp.mean(jnp.asarray(correct, jnp.float32)),
            avg_log_likelihood=jnp.mean(log_likelihoods),
            avg_likelihood=jnp.mean(jnp.exp(log_likelihoods)),
            ece=calibration.ece,
            signed_ece=calibration.signed_ece,
            hmc_agreement=None if agreements is None else jnp.mean(agreements),
            hmc_total_variation=(
                None if total_variations is None else jnp.mean(total_variations)
            ),
        )

    def as_dict(self) -> dict:
        out = {
            "accuracy": float(self.accuracy),
            "avg_log_likelihood": float(self.avg_log_likelihood),
            "avg_likelihood": float(self.avg_likelihood),
            "ece": float(self.ece),
            "signed_ece": float(self.signed_ece),
        }
        if self.hmc_agreement is not None:
            out["hmc_agreement"] = float(self.hmc_agreement)
        if self.hmc_total_variation is not None:
            out["hmc_total_variation"] = float(self.hmc_total_variation)
        return out
