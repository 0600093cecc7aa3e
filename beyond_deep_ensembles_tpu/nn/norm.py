"""Normalization layers.

StaticBatchNorm: BatchNorm WITHOUT running statistics — batch stats are
used in training AND at eval (the reference's
``BatchNorm2d(track_running_stats=False)``, resnet.py:21, and the
``static_bn`` patch, util.py:204-218 — the accuracy-critical mode per
BASELINE.md). Stateless: just learned scale/bias over per-batch
statistics, so no mutable collection needs threading (flax's BatchNorm
insists on writing running stats whenever they aren't used, which breaks
immutable eval application).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def channel_stats(x):
    """Per-channel batch statistics (mean, var) over all axes but the
    last, accumulated in fp32 (bf16 E[x^2]-E[x]^2 catastrophically
    cancels). The building block StaticBatchNorm uses, exposed so
    callers can REUSE stats: in DenseNet the per-channel stats of an
    already-concatenated slice are identical to the stats computed when
    that slice was produced, so each dense layer only needs stats for
    its 32 new channels (models/densenet.py incremental_bn)."""
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - mean**2
    return mean, var


class StaticBatchNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True, stats=None):
        """stats: optional precomputed (mean, var) per channel — MUST be
        the statistics of x itself (callers reuse cached stats of
        identical values to skip the reduction pass; the math and the
        gradient are unchanged because the cached stats are the same
        function of the same producing tensors)."""
        del train
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean, var = channel_stats(x) if stats is None else stats
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)
