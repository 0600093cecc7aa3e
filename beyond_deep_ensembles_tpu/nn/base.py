"""Model wrapper standardizing apply/init signatures and KL collection.

The reference mutates ``layer.kl`` attributes in forward passes and sums
them with ``collect_kl`` (reference src/algos/bbb.py:39-40). Functionally,
layers ``sow`` their KL into a dedicated flax collection and the wrapper
sums the leaves — one mechanism, fully jittable.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

KL_COLLECTION = "kl_terms"

# Mutable collections a model may carry besides params.
_STATE_COLLECTIONS = ("batch_stats", "sngp", "spectral_norm")


def sow_kl(module: nn.Module, value: jax.Array):
    """Record a layer's KL contribution for the current forward pass.

    init_fn must be explicit: flax's default init for a custom reduce_fn
    is the empty tuple, which makes the first reduction `() + value` and
    crashes any module that sows during init."""
    module.sow(
        KL_COLLECTION,
        "kl",
        value,
        reduce_fn=lambda a, b: a + b,
        init_fn=lambda: jnp.float32(0.0),
    )


def _sum_kl(collection) -> jax.Array:
    leaves = jax.tree.leaves(collection)
    if not leaves:
        return jnp.float32(0.0)
    return sum(jnp.sum(l) for l in leaves)


@dataclasses.dataclass(frozen=True)
class Model:
    """A flax module plus the calling convention used by all methods.

    init(key, *example_inputs) -> (params, model_state)
    apply(params, model_state, key, *inputs, train) -> (out, kl, new_model_state)

    ``key`` feeds both the 'noise' stream (Gaussian activation sampling in
    BBB/Rank-1/variational-FRN layers) and the 'dropout' stream.
    """

    module: nn.Module

    def init(self, key: jax.Array, *example_inputs, train: bool = True):
        k_params, k_noise, k_drop = jax.random.split(key, 3)
        variables = self.module.init(
            {"params": k_params, "noise": k_noise, "dropout": k_drop},
            *example_inputs,
            train=train,
        )
        variables = dict(variables)
        params = variables.pop("params", {})
        variables.pop(KL_COLLECTION, None)
        return params, variables

    def apply(
        self,
        params,
        model_state,
        key: Optional[jax.Array],
        *inputs,
        train: bool = True,
        mutable_state: bool = None,
        **kwargs,
    ):
        """Returns (output, kl, new_model_state).

        mutable_state: whether mutable collections (batch stats, SNGP
        precision) may update; defaults to ``train``.
        """
        if mutable_state is None:
            mutable_state = train
        model_state = model_state or {}
        rngs = {}
        if key is not None:
            k_noise, k_drop = jax.random.split(key)
            rngs = {"noise": k_noise, "dropout": k_drop}
        variables = {"params": params, **model_state}
        mutable = [KL_COLLECTION]
        if mutable_state:
            mutable += [c for c in model_state.keys()]
        out, updated = self.module.apply(
            variables, *inputs, train=train, rngs=rngs, mutable=mutable, **kwargs
        )
        updated = dict(updated)
        kl = _sum_kl(updated.pop(KL_COLLECTION, {}))
        new_state = {**model_state, **updated} if mutable_state else model_state
        return out, kl, new_state
