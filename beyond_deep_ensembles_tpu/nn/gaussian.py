"""Gaussian variational parameters as flax params with a naming convention.

Replaces reference ``GaussianParameter`` (src/algos/util.py:151-183):
a parameter ``w`` becomes two leaves ``w__gmean`` and ``w__grho`` with
std = softplus(rho). Methods discover them via the suffix (see
methods/api.py) instead of the reference's monkey-patched attributes.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..methods.api import GMEAN_SUFFIX, GRHO_SUFFIX

RHO_INIT = -3.0  # Blundell init (reference util.py:161-163)
MEAN_STD_INIT = 0.1


def blundell_mean_init(std: float = MEAN_STD_INIT):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def sign_mean_init():
    """±1 mean init used by Rank-1 VI factors (reference util.py:165-168)."""

    def init(key, shape, dtype=jnp.float32):
        return (jax.random.uniform(key, shape) > 0.5).astype(dtype) * 2.0 - 1.0

    return init


def gaussian_param(
    module: nn.Module,
    name: str,
    shape: Sequence[int],
    mean_init=None,
    rho_init: float = RHO_INIT,
):
    """Declare a Gaussian variational parameter; returns (mean, std)."""
    if mean_init is None:
        mean_init = blundell_mean_init()
    mean = module.param(name + GMEAN_SUFFIX, mean_init, shape)
    rho = module.param(
        name + GRHO_SUFFIX, lambda key, s: jnp.full(s, rho_init, jnp.float32), shape
    )
    return mean, jax.nn.softplus(rho)


def gaussian_sample(key: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """Reparameterized draw (reference util.py:170-171)."""
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def eval_noise(
    module: nn.Module,
    shape: Sequence[int],
    train: bool,
    freeze_on_eval: bool,
    stream: str = "noise",
) -> jax.Array:
    """Standard-normal noise for activation sampling.

    At eval with ``freeze_on_eval`` the reference draws ONE noise vector
    and broadcasts it over the batch (bbb_layers.py:76-78) so that one
    posterior sample behaves like one fixed network. Batch is axis 0.
    """
    key = module.make_rng(stream)
    if not train and freeze_on_eval:
        eps = jax.random.normal(key, shape[1:])
        return jnp.broadcast_to(eps, shape)
    return jax.random.normal(key, shape)
