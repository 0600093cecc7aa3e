"""Regression evaluation: MSE, posterior log-likelihoods, log marginal
likelihood, and quantile calibration (QCE / signed QCE).

Re-implementation of reference src/eval/regresssion.py (filename typo is
the reference's, not ours). Vectorized: the per-quantile Python loops
(regresssion.py:54-64) become one sorted gather.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct


def gauss_logprob(mean, variance, x):
    """Gaussian log-density (reference src/algos/util.py:8-9)."""
    return (
        -((x - mean) ** 2) / (2 * variance)
        - 0.5 * jnp.log(variance)
        - 0.5 * math.log(2 * math.pi)
    )


def _quantile_nearest(sorted_x: jax.Array, ps: jax.Array) -> jax.Array:
    """Quantiles with 'nearest' interpolation over axis 0 of pre-sorted
    data (reference regresssion.py:54 uses torch.quantile(...,
    interpolation="nearest"))."""
    n = sorted_x.shape[0]
    idx = jnp.rint(ps * (n - 1)).astype(jnp.int32)
    return sorted_x[idx]


def calc_quantile_frequencies(means, stds, targets, quantile_steps, key):
    """Observed central-interval coverage at ``quantile_steps`` symmetric
    levels (reference regresssion.py:49-64).

    means/stds: [S, ...] posterior-predictive Gaussian parameters.
    Draws one realization per (sample, point), takes empirical quantiles
    over the sample axis, and measures how often the target falls below
    each quantile.
    """
    ps = jnp.linspace(0.0, 1.0, 2 * quantile_steps - 1)
    samples = means + stds * jax.random.normal(key, means.shape, means.dtype)
    flat = samples.reshape(samples.shape[0], -1)
    sorted_flat = jnp.sort(flat, axis=0)
    quantiles = jax.vmap(lambda p: _quantile_nearest(sorted_flat, p))(ps)
    t = targets.reshape(-1)
    qf = jnp.mean(t[None, :] <= quantiles, axis=1)
    i = jnp.arange(quantile_steps)
    return qf[quantile_steps + i - 1] - qf[quantile_steps - i - 1]


class RegressionResults(struct.PyTreeNode):
    """Reference RegressionResults (regresssion.py:10-47).

    Built from ``outputs`` of shape [samples, datapoints, out_dim, 2]
    where [..., 0] is the predictive mean and [..., 1] the predictive std
    (the GaussLayer packing, reference src/architectures/gauss.py:14-16).
    """

    mse_of_means: jax.Array
    mean_mse: jax.Array
    log_likelihood: jax.Array
    average_log_likelihood: jax.Array
    lml: jax.Array
    average_lml: jax.Array
    observed_cdf: jax.Array
    quantile_ps: jax.Array
    qce: jax.Array

    @classmethod
    def create(
        cls,
        outputs: jax.Array,
        targets: jax.Array,
        key: jax.Array,
        cal_steps: int = 10,
        target_mean=0.0,
        target_std=1.0,
    ) -> "RegressionResults":
        outputs = jnp.asarray(outputs, jnp.float32)
        targets = jnp.asarray(targets, jnp.float32)
        samples, datapoints = outputs.shape[0], outputs.shape[1]

        # Denormalization (reference regresssion.py:119-126).
        means = outputs[..., 0] * target_std + target_mean
        stds = outputs[..., 1] * target_std
        targets = targets * target_std + target_mean

        lls = gauss_logprob(means, stds**2, targets)

        mse_of_means = jnp.mean((jnp.mean(means, axis=0) - targets) ** 2)
        mean_mse = jnp.mean((means - targets) ** 2)
        # Per-point posterior-predictive LL: logsumexp over samples
        # (reference regresssion.py:37-38).
        log_likelihood = -datapoints * math.log(samples) + jnp.sum(
            jax.scipy.special.logsumexp(lls, axis=0)
        )
        # Log *marginal* likelihood: joint over the dataset per sample
        # (reference regresssion.py:39-40).
        lls_flat = lls.reshape(samples, -1)
        lml = -math.log(samples) + jax.scipy.special.logsumexp(
            jnp.sum(lls_flat, axis=1), axis=0
        )

        observed_cdf = calc_quantile_frequencies(means, stds, targets, cal_steps, key)
        quantile_ps = jnp.linspace(0.0, 1.0, cal_steps)
        qce = jnp.mean(jnp.abs(observed_cdf - quantile_ps))

        return cls(
            mse_of_means=mse_of_means,
            mean_mse=mean_mse,
            log_likelihood=log_likelihood,
            average_log_likelihood=log_likelihood / datapoints,
            lml=lml,
            average_lml=lml / datapoints,
            observed_cdf=observed_cdf,
            quantile_ps=quantile_ps,
            qce=qce,
        )

    @property
    def sqce(self) -> jax.Array:
        """Signed QCE: negative = overconfident (reference
        regresssion.py:45-47)."""
        return jnp.mean(self.observed_cdf - self.quantile_ps)

    @classmethod
    def average(cls, results: list["RegressionResults"]) -> "RegressionResults":
        return jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *results)


def nll_loss(output, target, eps: float = 1e-4):
    """Heteroscedastic Gaussian NLL on GaussLayer outputs with variance
    clamp (reference src/algos/util.py:17-24)."""
    mean = output[..., 0]
    var = jnp.maximum(output[..., 1] ** 2, eps)
    return jnp.mean(0.5 * (jnp.log(var) + (mean - target) ** 2 / var))
