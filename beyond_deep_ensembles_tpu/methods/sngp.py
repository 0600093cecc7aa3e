"""SNGP training method.

Reference SNGPOptimizer (src/algos/kernel/sngp.py:235-267): plain
gradient training of the spectral-normalized backbone + GP head, with the
GP precision matrix reset each epoch and the covariance recomputed for
evaluation. Here the precision accumulates inside the jitted train step
(mutable ``sngp`` collection threaded through LossOutput.model_state) and
``finalize_epoch`` performs the Cholesky-inverse + reset on device.
"""
from __future__ import annotations

import optax

from ..nn.sngp import SNGP_COLLECTION, recompute_covariance_and_reset
from .api import LossFn, PosteriorMethod
from .map import map_method


def sngp_method(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    ridge_penalty: float = 0.001,
) -> PosteriorMethod:
    base = map_method(loss_fn, tx)

    def finalize_epoch(state):
        model_state = dict(state.model_state)
        if SNGP_COLLECTION in model_state:
            model_state[SNGP_COLLECTION] = recompute_covariance_and_reset(
                model_state[SNGP_COLLECTION], ridge_penalty
            )
        return state.replace(model_state=model_state, epoch=state.epoch + 1)

    return PosteriorMethod(
        init=base.init,
        update=base.update,
        sample=base.sample,
        finalize_epoch=finalize_epoch,
        sample_is_identity=True,
        multisample=True,
    )
