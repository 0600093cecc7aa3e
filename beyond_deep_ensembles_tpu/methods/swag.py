"""SWAG: Stochastic Weight Averaging - Gaussian.

Reference SwagOptimizer (src/algos/swag.py). TPU-native redesign: the
first/second-moment vectors and the deviation ring buffer live ON DEVICE
as method state (the reference round-trips the flattened model through CPU
every update, swag.py:100-104), and posterior sampling composes
``mean + dev^T z1 / sqrt(2(K-1)) + sqrt(diag) z2`` directly — never
materializing a covariance or running the reference's
``LowRankMultivariateNormal`` Cholesky machinery (swag.py:107-114).
The save/restore dirty-params dance (swag.py:76-89) disappears: sampling
is a pure function that leaves training state untouched.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..tree import make_unravel, ravel
from .api import LossFn, PosteriorMethod


class SwagState(struct.PyTreeNode):
    params: any
    model_state: any
    opt_state: any
    step: jax.Array
    epoch: jax.Array
    mean: jax.Array  # [D] running first moment
    sq_mean: jax.Array  # [D] running second moment
    deviations: jax.Array  # [K, D] ring buffer of deviation rows
    updates: jax.Array  # int32: number of moment updates so far
    steps_since_start: jax.Array  # int32


def swag_method(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    update_interval: int,
    start_epoch: int = 0,
    deviation_samples: int = 30,
    ring_dtype=jnp.float32,
    ring_sharding=None,
) -> PosteriorMethod:
    """ring_dtype / ring_sharding: big-backbone scaling knobs for the
    [K, D] deviation ring and [D] moment vectors — see methods/rings.py."""
    update_interval = int(math.floor(update_interval))
    from . import rings

    def init(key, params, model_state=None):
        del key
        # flat vectors pad D to a multiple of the sharding axis (zeros;
        # sliced off at unravel) so GSPMD can split them evenly
        flat = rings.pad_flat(ravel(params), ring_sharding)
        return SwagState(
            params=params,
            model_state=model_state or {},
            opt_state=tx.init(params),
            step=jnp.int32(0),
            epoch=jnp.int32(0),
            mean=rings.place(flat, ring_sharding),
            sq_mean=rings.place(flat**2, ring_sharding),
            deviations=rings.place(
                jnp.zeros((deviation_samples, flat.shape[0]), ring_dtype),
                ring_sharding,
            ),
            updates=jnp.int32(0),
            steps_since_start=jnp.int32(0),
        )

    def update(state: SwagState, key, batch):
        def total_loss(params):
            out = loss_fn(params, state.model_state, key, batch)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(total_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # SWAG bookkeeping (reference swag.py:91-105), branch-free.
        started = state.epoch >= start_epoch
        steps_since = state.steps_since_start + jnp.where(started, 1, 0)
        do_update = started & (steps_since % update_interval == 0)

        # The reference pre-increments its update counter (swag.py:98-102),
        # so collection k computes (k*mean + p)/(k+1) with mean seeded from
        # the INIT-time parameter vector — i.e. the init point counts as
        # one collected sample. Matched exactly (verified by
        # tests/test_reference_parity.py against the live reference).
        flat = rings.pad_flat(ravel(params), ring_sharding)
        n = state.updates + 1
        new_mean = (n * state.mean + flat) / (n + 1)
        new_sq = (n * state.sq_mean + flat**2) / (n + 1)
        new_dev = (
            jnp.roll(state.deviations, -1, axis=0)
            .at[-1]
            .set((flat - new_mean).astype(ring_dtype))
        )

        new_state = state.replace(
            params=params,
            model_state=out.model_state or state.model_state,
            opt_state=opt_state,
            step=state.step + 1,
            steps_since_start=steps_since,
            mean=rings.place(jnp.where(do_update, new_mean, state.mean), ring_sharding),
            sq_mean=rings.place(
                jnp.where(do_update, new_sq, state.sq_mean), ring_sharding
            ),
            deviations=rings.place(
                jnp.where(do_update, new_dev, state.deviations), ring_sharding
            ),
            updates=state.updates + jnp.where(do_update, 1, 0),
        )
        return new_state, {"loss": loss, **out.metrics}

    def sample(state: SwagState, key, index=None):
        """Low-rank + diagonal Gaussian draw (reference swag.py:107-114):
        diag = 0.5*(relu(sq - mean^2) + 1e-6), factor = dev / sqrt(2(K-1)).
        ``__mle`` leaves (GaussLayer variance) stay at their current point
        value — the reference excludes them from the SWAG posterior
        (uci/models.py:83 passes only model[0].parameters())."""
        del index
        k1, k2 = jax.random.split(key)
        diag = 0.5 * (jax.nn.relu(state.sq_mean - state.mean**2) + 1e-6)
        z1 = jax.random.normal(k1, (deviation_samples,))
        z2 = jax.random.normal(k2, state.mean.shape)
        # fp32 accumulation regardless of ring storage dtype
        low_rank = jnp.einsum(
            "k,kd->d", z1, state.deviations, preferred_element_type=jnp.float32
        )
        flat = (
            state.mean
            + low_rank / math.sqrt(2 * (deviation_samples - 1))
            + jnp.sqrt(diag) * z2
        )
        d = sum(leaf.size for leaf in jax.tree.leaves(state.params))
        params = make_unravel(state.params)(flat[:d])
        from .api import non_mle_mask

        mask = non_mle_mask(state.params)
        params = jax.tree.map(
            lambda m, s, cur: s if m else cur, mask, params, state.params
        )
        return params, state.model_state

    def finalize_epoch(state: SwagState):
        return state.replace(epoch=state.epoch + 1)

    return PosteriorMethod(
        init=init, update=update, sample=sample, finalize_epoch=finalize_epoch
    )
