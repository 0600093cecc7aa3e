"""MAP (point estimate) method.

Reference MAPOptimizer (src/algos/pp.py:6-34): forward, backward, base
optimizer step; ``sample_parameters`` is a no-op. Also the chassis for
MC-Dropout — MCD is MAP training with FixableDropout layers active at
eval (reference src/algos/dropout.py), so there is no separate method.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .api import LossFn, MethodState, PosteriorMethod, default_finalize_epoch


def map_method(loss_fn: LossFn, tx: optax.GradientTransformation) -> PosteriorMethod:
    def init(key, params, model_state=None):
        del key
        return MethodState(
            params=params,
            model_state=model_state or {},
            opt_state=tx.init(params),
            step=jnp.int32(0),
            epoch=jnp.int32(0),
        )

    def update(state: MethodState, key, batch):
        def total_loss(params):
            out = loss_fn(params, state.model_state, key, batch)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(total_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            model_state=out.model_state or state.model_state,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, **out.metrics}

    def sample(state: MethodState, key, index=None):
        del key, index
        return state.params, state.model_state

    return PosteriorMethod(
        init=init,
        update=update,
        sample=sample,
        finalize_epoch=default_finalize_epoch,
        sample_is_identity=True,
    )
