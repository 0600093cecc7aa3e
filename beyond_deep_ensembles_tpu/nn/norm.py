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


class StaticBatchNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x), axis=axes) - mean**2
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
