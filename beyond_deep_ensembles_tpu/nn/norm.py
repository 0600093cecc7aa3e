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
        # Statistics in fp32 even under bf16 compute: E[x^2]-E[x]^2 in
        # bf16 catastrophically cancels. Output returns to x.dtype so the
        # surrounding convs stay on the bf16 MXU path.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - mean**2
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)
