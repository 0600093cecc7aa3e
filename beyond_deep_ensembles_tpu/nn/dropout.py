"""MC-Dropout layer.

Reference FixableDropout (src/algos/dropout.py:5-25): dropout stays active
at evaluation (that *is* MC-Dropout); with ``freeze_on_eval`` the same
mask is shared across the minibatch at eval, and — faithfully to the
reference — that frozen path does NOT rescale by 1/(1-p) (dropout.py:18-20)
while the active path does.

``freeze_on_eval`` defaults to True like the reference class
(dropout.py:11) — the from-scratch architectures (CIFAR/poverty ResNets,
camelyon DenseNet, UCI MLP) all construct ``FixableDropout(p)`` with
that default, and the frozen-no-rescale eval path measurably changes
their MC-Dropout results (r3: ~0.1 CIFAR accuracy). The pretrained-
backbone tasks pass ``freeze_on_eval=False`` explicitly
(iwildcam/models.py:75, patch_dropout default False).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FixableDropout(nn.Module):
    rate: float
    freeze_on_eval: bool = True

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
