"""Full-batch Hamiltonian Monte Carlo with adaptive step size.

Reference: bnn_hmc/core/hmc.py — leapfrog integration under
``lax.fori_loop``, Metropolis-Hastings acceptance on the joint
kinetic + likelihood + prior energy difference, multiplicative step-size
adaptation toward a target accept rate. Re-designed here as a
PosteriorMethod whose ``update`` runs one complete HMC iteration as a
single jitted program over the (sharded) full batch, with an on-device
ring buffer of accepted draws for prediction.

The potential is U(θ) = dataset_size * loss(θ) + ||θ||^2/(2 prior_std^2)
(tempered likelihood lives inside ``loss_fn`` if desired).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .. import tree
from .api import LossFn, PosteriorMethod, default_finalize_epoch


class HmcState(struct.PyTreeNode):
    params: Any
    model_state: Any
    opt_state: Any  # unused, chassis compatibility
    step: jax.Array
    epoch: jax.Array
    step_size: jax.Array
    log_likelihood: jax.Array  # -dataset_size * loss at params
    grad: Any  # gradient of -U at params (ascent direction)
    samples: jax.Array  # [K, D] ring of accepted draws
    n_samples: jax.Array
    accept_prob: jax.Array
    accepted: jax.Array


def leapfrog(grad_fn, params, momentum, grad, loglik, step_size, n_leapfrog):
    """Compiled leapfrog integrator (reference make_leapfrog,
    bnn_hmc/core/hmc.py:36-64): half-kick, drift, gradient, half-kick, as
    a lax.scan. grad_fn(params) -> ((neg_U, (loglik, aux)), grad).
    Exposed at module level so trajectories can be compared directly
    against the reference integrator (tests/test_reference_parity_bnn_hmc.py)."""

    def leapfrog_body(carry, _):
        params, momentum, grad, loglik = carry
        momentum = tree.tree_add(momentum, grad, scale=0.5 * step_size)
        params = tree.tree_add(params, momentum, scale=step_size)
        (_, (loglik, _)), grad = grad_fn(params)
        momentum = tree.tree_add(momentum, grad, scale=0.5 * step_size)
        return (params, momentum, grad, loglik), None

    (params, momentum, grad, loglik), _ = jax.lax.scan(
        leapfrog_body, (params, momentum, grad, loglik), None, length=n_leapfrog
    )
    return params, momentum, grad, loglik


def hmc_method(
    loss_fn: LossFn,
    dataset_size: int,
    step_size: float = 1e-4,
    n_leapfrog: int = 50,
    prior_std: float = 1.0,
    target_accept_rate: float = 0.8,
    step_size_adaptation_speed: float = 0.0,
    max_samples: int = 20,
    do_mh_correction: bool = True,
    ring_dtype=jnp.float32,
    ring_sharding=None,
) -> PosteriorMethod:
    """ring_dtype / ring_sharding: big-backbone scaling knobs for the
    [max_samples, D] draw ring — see methods/rings.py."""
    from . import rings

    def log_prior(params):
        return -tree.tree_sq_norm(params) / (2 * prior_std**2)

    def make_loglik_and_grad(model_state, key, batch):
        def neg_u(params):
            out = loss_fn(params, model_state, key, batch)
            loglik = -dataset_size * out.loss
            return loglik + log_prior(params), (loglik, out)

        return jax.value_and_grad(neg_u, has_aux=True)

    def init(key, params, model_state=None):
        del key
        # D padded to the sharding axis (rings.py); zeros sliced off on read
        flat = rings.pad_flat(tree.ravel(params), ring_sharding)
        return HmcState(
            params=params,
            model_state=model_state or {},
            opt_state=None,
            step=jnp.int32(0),
            epoch=jnp.int32(0),
            step_size=jnp.float32(step_size),
            log_likelihood=jnp.float32(-jnp.inf),
            grad=tree.tree_zeros_like(params),
            samples=rings.place(
                jnp.zeros((max_samples, flat.shape[0]), ring_dtype), ring_sharding
            ),
            n_samples=jnp.int32(0),
            accept_prob=jnp.float32(0.0),
            accepted=jnp.bool_(False),
        )

    def update(state: HmcState, key, batch):
        """One adaptive HMC iteration (reference hmc.py:107-148)."""
        k_mom, k_accept, k_grad = jax.random.split(key, 3)
        grad_fn = make_loglik_and_grad(state.model_state, k_grad, batch)

        # (Re)compute energy/grad at the current point: cheap relative to
        # n_leapfrog gradient evaluations and keeps the state minimal.
        (_, (loglik0, _)), grad0 = grad_fn(state.params)

        momentum0 = tree.normal_like(k_mom, state.params)

        params1, momentum1, grad1, loglik1 = leapfrog(
            grad_fn, state.params, momentum0, grad0, loglik0,
            state.step_size, n_leapfrog,
        )

        # MH acceptance on the energy difference (reference hmc.py:86-96).
        kinetic_diff = 0.5 * (
            tree.tree_sq_norm(momentum0) - tree.tree_sq_norm(momentum1)
        )
        energy_diff = (
            kinetic_diff
            - (loglik0 - loglik1)
            - (log_prior(state.params) - log_prior(params1))
        )
        energy_diff = jnp.where(jnp.isnan(energy_diff), -jnp.inf, energy_diff)
        accept_prob = jnp.minimum(1.0, jnp.exp(energy_diff))
        accepted = jax.random.uniform(k_accept) < accept_prob

        new_step_size = jnp.where(
            (target_accept_rate > 0) & (step_size_adaptation_speed > 0),
            state.step_size
            * jnp.exp(step_size_adaptation_speed * (accept_prob - target_accept_rate)),
            state.step_size,
        )

        take = accepted if do_mh_correction else jnp.bool_(True)
        params = tree.tree_where(take, params1, state.params)
        grad = tree.tree_where(take, grad1, grad0)
        loglik = jnp.where(take, loglik1, loglik0)

        flat = rings.pad_flat(tree.ravel(params), ring_sharding)
        new_samples = (
            jnp.roll(state.samples, -1, axis=0).at[-1].set(flat.astype(ring_dtype))
        )
        new_state = state.replace(
            params=params,
            step=state.step + 1,
            step_size=new_step_size,
            log_likelihood=loglik,
            grad=grad,
            samples=rings.place(
                jnp.where(take, new_samples, state.samples), ring_sharding
            ),
            n_samples=jnp.minimum(state.n_samples + jnp.where(take, 1, 0), max_samples),
            accept_prob=accept_prob,
            accepted=take,
        )
        metrics = {
            "log_likelihood": loglik,
            "accept_prob": accept_prob,
            "accepted": take.astype(jnp.float32),
            "step_size": new_step_size,
        }
        return new_state, metrics

    def sample(state: HmcState, key, index=None):
        del key
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
        return tree.make_unravel(state.params)(flat), state.model_state

    return PosteriorMethod(
        init=init, update=update, sample=sample, finalize_epoch=default_finalize_epoch
    )
