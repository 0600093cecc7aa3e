"""Mean-field VI over the whole parameter tree (parameter-space MFVI).

Reference: bnn_hmc/core/vi.py:42-131 — a Gaussian posterior pytree
(means + inv-softplus stds) trained by reparameterized ELBO gradients
with a tempered KL to an isotropic Gaussian prior. Distinct from the
layerwise BBB method (methods/bbb.py), which relies on Bayesian layers
and local reparameterization; MFVI wraps ANY deterministic model.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import tree
from .api import LossFn, PosteriorMethod, default_finalize_epoch


class MfviState(struct.PyTreeNode):
    params: Any  # current mean (alias for prediction convenience)
    model_state: Any
    opt_state: Any
    step: jax.Array
    epoch: jax.Array
    mean: Any
    rho: Any  # std = softplus(rho)


def _gauss_kl_iso(mean, rho, prior_std: float):
    """KL( N(mean, softplus(rho)^2) || N(0, prior_std^2) ), summed."""

    def leaf_kl(m, r):
        s = jax.nn.softplus(r)
        return jnp.sum(
            jnp.log(prior_std / s)
            - 0.5
            + (s**2 + m**2) / (2 * prior_std**2)
        )

    parts = jax.tree.map(leaf_kl, mean, rho)
    return jax.tree.reduce(jnp.add, parts, jnp.float32(0.0))


def mfvi_method(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    dataset_size: int,
    prior_std: float = 1.0,
    sigma_init: float = 0.01,
    mc_samples: int = 1,
    kl_weight: float = 1.0,
    temperature: float = 1.0,
) -> PosteriorMethod:
    rho_init = math.log(math.expm1(sigma_init))

    def init(key, params, model_state=None):
        del key
        mean = params
        rho = jax.tree.map(lambda p: jnp.full_like(p, rho_init), params)
        return MfviState(
            params=mean,
            model_state=model_state or {},
            opt_state=tx.init((mean, rho)),
            step=jnp.int32(0),
            epoch=jnp.int32(0),
            mean=mean,
            rho=rho,
        )

    def update(state: MfviState, key, batch):
        mc_keys = jax.random.split(key, mc_samples)

        def elbo_loss(mean_rho):
            mean, rho = mean_rho

            def mc_body(carry, k):
                model_state, acc = carry
                eps = tree.normal_like(k, mean)
                params = jax.tree.map(
                    lambda m, r, e: m + jax.nn.softplus(r) * e, mean, rho, eps
                )
                out = loss_fn(params, model_state, k, batch)
                return (out.model_state or model_state, acc + out.loss), None

            (model_state, data_loss), _ = jax.lax.scan(
                mc_body, (state.model_state, jnp.float32(0.0)), mc_keys
            )
            kl = _gauss_kl_iso(mean, rho, prior_std)
            loss = data_loss / mc_samples + temperature * kl_weight * kl / dataset_size
            return loss, (model_state, data_loss / mc_samples, kl)

        (loss, (model_state, data_loss, kl)), grads = jax.value_and_grad(
            elbo_loss, has_aux=True
        )((state.mean, state.rho))
        updates, opt_state = tx.update(grads, state.opt_state, (state.mean, state.rho))
        mean, rho = optax.apply_updates((state.mean, state.rho), updates)
        return (
            state.replace(
                params=mean,
                model_state=model_state,
                opt_state=opt_state,
                step=state.step + 1,
                mean=mean,
                rho=rho,
            ),
            {"loss": loss, "data_loss": data_loss, "kl": kl},
        )

    def sample(state: MfviState, key, index=None):
        del index
        eps = tree.normal_like(key, state.mean)
        params = jax.tree.map(
            lambda m, r, e: m + jax.nn.softplus(r) * e, state.mean, state.rho, eps
        )
        return params, state.model_state

    return PosteriorMethod(
        init=init, update=update, sample=sample, finalize_epoch=default_finalize_epoch
    )
