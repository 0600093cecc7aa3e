"""Loss / likelihood functions for Bayesian training.

Reference bnn_hmc/utils/losses.py: tempered softmax cross-entropy
(:38-50), Gaussian log-prior and prior-difference (:53-73), and the
heteroscedastic Gaussian likelihood with softplus-parameterized std
(:76-110). These are the potentials the HMC / SG-MCMC / MFVI methods
consume; ``nll_loss`` (reference src/algos/util.py:17-24) lives in
evals/regression.py.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import tree


def tempered_softmax_xent(logits, labels, temperature: float = 1.0):
    """Mean tempered cross-entropy: log-likelihood scaled by 1/T
    (reference losses.py:38-50)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(ll) / temperature


def gaussian_log_prior(params, prior_std: float = 1.0):
    """Sum of iid Gaussian log-densities over every parameter
    (reference losses.py:53-63)."""
    n = tree.tree_size(params)
    sq = tree.tree_sq_norm(params)
    return -0.5 * sq / prior_std**2 - 0.5 * n * math.log(2 * math.pi * prior_std**2)


def gaussian_log_prior_diff(params1, params2, prior_std: float = 1.0):
    """log p(params1) - log p(params2), computed as a norm difference in
    fp32 for accuracy (reference losses.py:66-73, used by the HMC
    accept-reject step)."""
    return (tree.tree_sq_norm(params2) - tree.tree_sq_norm(params1)) / (
        2 * prior_std**2
    )


def heteroscedastic_gaussian_ll(outputs, targets, min_std: float = 1e-3):
    """Per-point Gaussian log-likelihood for (mean, raw_std) output pairs
    with softplus-std parameterization (reference losses.py:76-110)."""
    mean = outputs[..., 0]
    std = jax.nn.softplus(outputs[..., 1]) + min_std
    return (
        -0.5 * ((targets - mean) / std) ** 2
        - jnp.log(std)
        - 0.5 * math.log(2 * math.pi)
    )
