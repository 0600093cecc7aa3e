"""GaussLayer: turn a scalar regression output into a (mean, std) pair.

Reference src/architectures/gauss.py:5-24 / src/algos/util.py:66-88.
Output shape [..., 2] with [..., 0] = mean, [..., 1] = std.

When ``learn_var`` the rho parameter carries the ``__mle`` suffix so
parameter-space methods (SVGD, iVON over all params) exclude it from their
posterior — the reference tagged it ``use_mle_training`` and trained it
with a separate SGD "var_optimizer" (reference util.py:72-73,
experiments/uci/models.py:17-21).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..methods.api import MLE_SUFFIX


def _softplus_inverse(x: float) -> float:
    return math.log(math.expm1(x))


class GaussLayer(nn.Module):
    std_init: float = 1.0
    learn_var: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        rho_init = _softplus_inverse(self.std_init)
        if self.learn_var:
            rho = self.param(
                "rho" + MLE_SUFFIX, lambda key, s: jnp.full(s, rho_init), (1,)
            )
        else:
            rho = jnp.full((1,), rho_init, x.dtype)
        std = jax.nn.softplus(rho)
        return jnp.stack([x, jnp.broadcast_to(std, x.shape)], axis=-1)
