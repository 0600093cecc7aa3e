"""MC-Dropout layer.

Reference FixableDropout (src/algos/dropout.py:5-25): dropout stays active
at evaluation (that *is* MC-Dropout); with ``freeze_on_eval`` the same
mask is shared across the minibatch at eval, and — faithfully to the
reference — that frozen path does NOT rescale by 1/(1-p) (dropout.py:18-20)
while the active path does.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FixableDropout(nn.Module):
    rate: float
    freeze_on_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        keep = 1.0 - self.rate
        if not train and self.freeze_on_eval:
            mask = jax.random.bernoulli(key, keep, x.shape[1:])
            return x * jnp.broadcast_to(mask, x.shape)
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
