"""SNGP: Random-Fourier-Feature Gaussian-process head.

Reference src/algos/kernel/sngp.py (itself based on arXiv:2006.10108 and
edward2's random_feature layer). Components:

  * RandomFourierFeatures — fixed (non-trainable) projection with
    blockwise-orthogonal init and chi-distributed column norms
    (reference sngp.py:12-48), k = scale * cos(x W + b);
  * SNGPHead — optional JL projection + layernorm, RFF, trainable output
    layer beta, and a streaming Laplace precision matrix accumulated over
    each training epoch (sngp.py:137-140). At eval the head applies the
    mean-field logit correction (sngp.py:112-120) or draws MC logit
    samples from the diagonal predictive Gaussian (sngp.py:222-228;
    we use sqrt(var) where the reference mistakenly used var as the
    std — SURVEY.md wart list).

The precision matrix lives in the mutable ``sngp`` collection; the
covariance is (re)computed ONCE per epoch boundary by
``methods.sngp.sngp_method``'s finalize_epoch (the reference recomputed
lazily at first eval, sngp.py:149-160 — same linear algebra, explicit
schedule)."""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

SNGP_COLLECTION = "sngp"
BUFFERS = "buffers"


def _random_ortho(key, n, m, std):
    q, _ = jnp.linalg.qr(std * jax.random.normal(key, (n, m)))
    return q


def _rff_kernel_init(std: float):
    """Blockwise-orthogonal rows with chi-scaled column norms
    (reference sngp.py:29-44)."""

    def init(key, shape, dtype=jnp.float32):
        in_dim, num_features = shape
        k1, k2 = jax.random.split(key)
        if num_features <= in_dim:
            w = _random_ortho(k1, in_dim, num_features, std)
        else:
            blocks = []
            left = num_features
            keys = jax.random.split(k1, num_features // in_dim + 1)
            i = 0
            while left > in_dim:
                blocks.append(_random_ortho(keys[i], in_dim, in_dim, std))
                left -= in_dim
                i += 1
            blocks.append(_random_ortho(keys[i], in_dim, left, std))
            w = jnp.concatenate(blocks, axis=1)
        feature_norm = jax.random.normal(k2, w.shape) ** 2
        return (w * jnp.sqrt(feature_norm.sum(0))).astype(dtype)

    return init


class RandomFourierFeatures(nn.Module):
    """k(x) = feature_scale * cos(x W + b), W/b fixed buffers
    (reference sngp.py:17-52)."""

    num_random_features: int
    feature_scale: Optional[float] = None
    std: float = 1.0

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        scale = self.feature_scale
        if scale is None:
            scale = math.sqrt(2.0 / self.num_random_features)
        w = self.variable(
            BUFFERS,
            "W",
            lambda: _rff_kernel_init(self.std)(
                self.make_rng("params"), (in_dim, self.num_random_features)
            ),
        ).value
        b = self.variable(
            BUFFERS,
            "b",
            lambda: jax.random.uniform(
                self.make_rng("params"), (self.num_random_features,), maxval=2 * math.pi
            ),
        ).value
        return scale * jnp.cos(x @ w + b)


class SNGPHead(nn.Module):
    """Laplace-approximated GP output head (reference Laplace + SNGPWrapper,
    sngp.py:55-233). Input: deep features f [B, D]. Output:
    train -> logits [B, O]; eval mean-field -> corrected logits [B, O];
    eval mc -> logit samples [S, B, O]."""

    outputs: int
    num_random_features: int = 1024
    num_gp_features: int = -1  # >0 enables the JL projection
    normalize_gp_features: bool = True
    ridge_penalty: float = 0.001
    feature_scale: Optional[float] = 2.0
    mean_field_factor: Optional[float] = 0.25
    rff_init_std: float = 1.0
    sampling_mode: str = "mean field"  # or "mc"

    @nn.compact
    def __call__(self, f, train: bool = True, n_samples: int = 1):
        if self.num_gp_features > 0:
            rm = self.variable(
                BUFFERS,
                "random_matrix",
                lambda: 0.05
                * jax.random.normal(
                    self.make_rng("params"), (f.shape[-1], self.num_gp_features)
                ),
            ).value
            f = f @ rm
        if self.normalize_gp_features:
            f = nn.LayerNorm()(f)

        k = RandomFourierFeatures(
            self.num_random_features, self.feature_scale, self.rff_init_std
        )(f)
        pred = nn.Dense(self.outputs, name="beta")(k)

        r = self.num_random_features
        precision = self.variable(
            SNGP_COLLECTION, "precision", lambda: self.ridge_penalty * jnp.eye(r)
        )
        covariance = self.variable(
            SNGP_COLLECTION, "covariance", lambda: jnp.eye(r)
        )
        seen = self.variable(
            SNGP_COLLECTION, "seen_data", lambda: jnp.zeros((), jnp.int32)
        )

        if train:
            if not self.is_initializing():
                kf = jax.lax.stop_gradient(k.astype(jnp.float32))
                precision.value = precision.value + kf.T @ kf
                seen.value = seen.value + f.shape[0]
            return pred

        pred_cov = (k @ covariance.value @ k.T) * self.ridge_penalty
        if self.sampling_mode == "mean field":
            if self.mean_field_factor is None:
                return pred, pred_cov
            scale = jnp.sqrt(1.0 + jnp.diagonal(pred_cov) * self.mean_field_factor)
            logits = jnp.where(self.mean_field_factor > 0, pred / scale[:, None], pred)
            if n_samples > 1:
                return jnp.broadcast_to(logits, (n_samples,) + logits.shape)
            return logits
        # MC mode: diagonal-Gaussian logit sampling.
        std = jnp.sqrt(jnp.maximum(jnp.diagonal(pred_cov), 1e-12))[:, None]
        eps = jax.random.normal(
            self.make_rng("noise"), (n_samples,) + pred.shape, pred.dtype
        )
        samples = pred[None] + std[None] * eps
        if n_samples > 1:
            return samples
        return samples[0]


def recompute_covariance_and_reset(sngp_state: dict, ridge_penalty: float, eps: float = 1e-7):
    """Epoch boundary: covariance <- inv(precision) via Cholesky, then
    reset precision to ridge * I (reference sngp.py:106-110, 149-160,
    243-246). Works on the raw ``sngp`` collection dict (recurses to any
    subtree holding a ``precision`` leaf)."""

    def walk(node):
        if isinstance(node, dict) and "precision" in node:
            prec = node["precision"]
            r = prec.shape[0]
            chol = jax.scipy.linalg.cho_factor(prec + eps * jnp.eye(r))
            cov = jax.scipy.linalg.cho_solve(chol, jnp.eye(r))
            return {
                **node,
                "covariance": cov,
                "precision": ridge_penalty * jnp.eye(r),
                "seen_data": jnp.zeros((), jnp.int32),
            }
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(sngp_state)
