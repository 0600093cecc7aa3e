"""SG-MCMC: SGLD / SGHMC as optax gradient transformations, plus a
PosteriorMethod wrapper that keeps a ring buffer of posterior draws.

Reference: the vendored bnn_hmc subtree implements SGLD/SGHMC as optax
transformations with optional RMSProp preconditioning
(google-bnn-hmc/bnn_hmc/core/sgmcmc.py:52-183). This is a fresh
implementation with the same dynamics, written for the loss-gradient
(descent) convention used everywhere in this framework:

  m   <- momentum_decay * m + sqrt(lr) * (-g_U) + sqrt(2 (1-momentum_decay)) * M^{1/2} eps
  θ   <- θ + sqrt(lr) * M^{-1} m

where g_U is the gradient of the potential U = N * minibatch_loss +
neg_log_prior, M the preconditioner, and temperature scales the injected
noise. momentum_decay = 0 recovers SGLD, > 0 gives SGHMC.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import tree
from .api import LossFn, PosteriorMethod, default_finalize_epoch


class RMSPreconditioner(NamedTuple):
    """RMSProp-style diagonal mass matrix (reference sgmcmc.py:119-154)."""

    running_average_factor: float = 0.99
    eps: float = 1e-7

    def init(self, params):
        return tree.tree_zeros_like(params)

    def update(self, grads, state):
        a = self.running_average_factor
        return jax.tree.map(lambda e, g: a * e + (1 - a) * g * g, state, grads)

    def m_sqrt(self, vec, state):
        return jax.tree.map(lambda e, v: v * jnp.sqrt(self.eps + jnp.sqrt(e)), state, vec)

    def m_inv(self, vec, state):
        return jax.tree.map(lambda e, v: v / (self.eps + jnp.sqrt(e)), state, vec)


class IdentityPreconditioner(NamedTuple):
    def init(self, params):
        return None

    def update(self, grads, state):
        return None

    def m_sqrt(self, vec, state):
        return vec

    def m_inv(self, vec, state):
        return vec


class SGLDState(NamedTuple):
    count: jax.Array
    momentum: Any
    precond_state: Any


def sgld(
    step_size_fn: Union[float, Callable],
    momentum_decay: float = 0.0,
    temperature: float = 1.0,
    preconditioner=None,
) -> optax.GradientTransformation:
    """SGLD / SGHMC as an optax transformation over potential gradients.

    The RNG rides in as part of the gradient pytree? No — optax updates
    are deterministic; pass the noise key via ``update(..., key=...)``
    through our PosteriorMethod wrapper below, or use
    ``sgld_method`` directly.
    """
    lr_fn = step_size_fn if callable(step_size_fn) else (lambda _: step_size_fn)
    pc = preconditioner or IdentityPreconditioner()

    def init(params):
        return SGLDState(
            count=jnp.zeros([], jnp.int32),
            momentum=tree.tree_zeros_like(params),
            precond_state=pc.init(params),
        )

    def update(grads, state, params=None, *, key=None):
        del params
        lr = lr_fn(state.count)
        lr_sqrt = jnp.sqrt(lr)
        noise_std = jnp.sqrt(2.0 * (1.0 - momentum_decay) * temperature)

        pstate = pc.update(grads, state.precond_state)
        if key is None:
            noise = tree.tree_zeros_like(grads)
        else:
            noise = pc.m_sqrt(tree.normal_like(key, grads), pstate)

        momentum = jax.tree.map(
            lambda m, g, n: momentum_decay * m - g * lr_sqrt + n * noise_std,
            state.momentum,
            grads,
            noise,
        )
        updates = jax.tree.map(lambda u: u * lr_sqrt, pc.m_inv(momentum, pstate))
        return updates, SGLDState(state.count + 1, momentum, pstate)

    return optax.GradientTransformation(init, update)


class SgmcmcState(struct.PyTreeNode):
    params: Any
    model_state: Any
    opt_state: Any
    step: jax.Array
    epoch: jax.Array
    samples: jax.Array  # [K, D] ring buffer of flat posterior draws
    n_samples: jax.Array  # int32, number of valid entries


def sgmcmc_method(
    loss_fn: LossFn,
    dataset_size: int,
    step_size_fn: Union[float, Callable],
    momentum_decay: float = 0.0,
    temperature: float = 1.0,
    prior_std: float = 1.0,
    preconditioner: Optional[str] = None,
    sample_interval: int = 100,
    max_samples: int = 20,
    burn_in_steps: int = 0,
    ring_dtype=jnp.float32,
    ring_sharding=None,
) -> PosteriorMethod:
    """SGLD/SGHMC as a PosteriorMethod. Every ``sample_interval`` steps
    past ``burn_in_steps`` the current parameters are pushed into an
    on-device ring buffer; prediction cycles those draws (the bnn_hmc
    runner instead ensembled predictions online, run_sgmcmc.py).

    ring_dtype / ring_sharding: big-backbone scaling knobs for the
    [max_samples, D] draw ring — see methods/rings.py."""
    from . import rings

    pc = RMSPreconditioner() if preconditioner == "rmsprop" else None
    tx = sgld(step_size_fn, momentum_decay, temperature, pc)

    def init(key, params, model_state=None):
        del key
        # D padded to the sharding axis (rings.py); zeros sliced off on read
        flat = rings.pad_flat(tree.ravel(params), ring_sharding)
        return SgmcmcState(
            params=params,
            model_state=model_state or {},
            opt_state=tx.init(params),
            step=jnp.int32(0),
            epoch=jnp.int32(0),
            samples=rings.place(
                jnp.zeros((max_samples, flat.shape[0]), ring_dtype), ring_sharding
            ),
            n_samples=jnp.int32(0),
        )

    def update(state: SgmcmcState, key, batch):
        k_grad, k_noise = jax.random.split(key)

        def potential(params):
            out = loss_fn(params, state.model_state, k_grad, batch)
            prior = tree.tree_sq_norm(params) / (2 * prior_std**2)
            return dataset_size * out.loss + prior, out

        (pot, out), grads = jax.value_and_grad(potential, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, key=k_noise)
        params = optax.apply_updates(state.params, updates)

        step = state.step + 1
        do_sample = (step > burn_in_steps) & (step % sample_interval == 0)
        flat = rings.pad_flat(tree.ravel(params), ring_sharding)
        new_samples = (
            jnp.roll(state.samples, -1, axis=0).at[-1].set(flat.astype(ring_dtype))
        )
        new_state = state.replace(
            params=params,
            model_state=out.model_state or state.model_state,
            opt_state=opt_state,
            step=step,
            samples=rings.place(
                jnp.where(do_sample, new_samples, state.samples), ring_sharding
            ),
            n_samples=jnp.minimum(
                state.n_samples + jnp.where(do_sample, 1, 0), max_samples
            ),
        )
        return new_state, {"loss": out.loss, "potential": pot}

    def sample(state: SgmcmcState, key, index=None):
        if index is None:
            index = 0
        n = jnp.maximum(state.n_samples, 1)
        slot = max_samples - 1 - (jnp.asarray(index) % n)
        d = sum(leaf.size for leaf in jax.tree.leaves(state.params))
        flat = jnp.where(
            state.n_samples > 0,
            rings.load(state.samples[slot])[:d],
            tree.ravel(state.params),
        )
        params = tree.make_unravel(state.params)(flat)
        return params, state.model_state

    return PosteriorMethod(
        init=init, update=update, sample=sample, finalize_epoch=default_finalize_epoch
    )
