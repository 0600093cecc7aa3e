"""Bayes-By-Backprop method (also trains Rank-1 VI models).

Reference BBBOptimizer (src/algos/bbb.py:43-99). The host-side MC loop
(bbb.py:63-67) becomes a ``lax.scan`` inside one jitted step; KL is
collected ONCE per step, closed-form, from the Gaussian variational
parameter leaves (bbb.py:69-80); plain parameters get L2 (bbb.py:75-76);
loss = kl_rescaling/N * KL + data_loss/(mc_samples * components)
(bbb.py:78-80); a non-finite loss skips the parameter update
(bbb.py:81-87).

Rank-1 VI (reference src/algos/rank1.py trained with
``BBBOptimizer(components=C)``, experiments/cifar/models.py:76-79):
pass ``components=C`` here and a ``loss_fn`` accepting a ``component``
kwarg; the method cycles the active mixture component across MC samples
and steps, replacing the reference's per-forward module counter
(rank1.py:63).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .. import tree
from .api import (
    LossFn,
    MethodState,
    PosteriorMethod,
    collect_gaussian_kl,
    default_finalize_epoch,
    l2_of_plain_params,
)


def bbb_method(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    prior,
    dataset_size: int,
    mc_samples: int = 1,
    kl_rescaling: float = 1.0,
    components: int = 1,
    l2_scale: float = 0.0,
) -> PosteriorMethod:
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
        mc_keys = jax.random.split(key, mc_samples)
        base_component = (state.step * mc_samples) % components

        def total_loss(params):
            def mc_body(carry, inp):
                model_state, acc_loss, _ = carry
                k, i = inp
                kwargs = {}
                if components > 1:
                    kwargs["component"] = (base_component + i) % components
                out = loss_fn(params, model_state, k, batch, **kwargs)
                new_ms = out.model_state or model_state
                return (new_ms, acc_loss + out.loss, out.kl), out.metrics

            # unroll: a rolled scan makes XLA stage each iteration's
            # backward residuals through stacked dynamic-slice buffers —
            # measured 1.7x the HBM traffic of the same math unrolled
            # (mc=2 bf16 ResNet-20 step: 9.5 GB rolled vs 5.6 GB
            # unrolled, XLA cost analysis on TPU v5e, r3).
            # mc_samples is small (<=5 in every reference config).
            (model_state, data_loss, sown_kl), metrics = jax.lax.scan(
                mc_body,
                (state.model_state, jnp.float32(0.0), jnp.float32(0.0)),
                (mc_keys, jnp.arange(mc_samples)),
                unroll=mc_samples,
            )
            # KL collected once (reference bbb.py:69-79): closed-form
            # Gaussian KL + layer-sown KL + L2 on plain params.
            kl = collect_gaussian_kl(params, prior) + sown_kl
            if l2_scale:
                kl = kl + l2_scale * l2_of_plain_params(params)
            pi = kl_rescaling / dataset_size
            loss = pi * kl + data_loss / (mc_samples * components)
            return loss, (model_state, data_loss, kl, metrics)

        (loss, (model_state, data_loss, kl, metrics)), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(state.params)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # NaN guard: skip the update on non-finite loss (reference bbb.py:81).
        ok = jnp.isfinite(loss)
        new_state = state.replace(
            params=tree.tree_where(ok, new_params, state.params),
            model_state=model_state,
            opt_state=jax.tree.map(
                lambda n, o: jnp.where(ok, n, o) if isinstance(n, jax.Array) else n,
                opt_state,
                state.opt_state,
            ),
            step=state.step + 1,
        )
        out_metrics = {
            "loss": loss,
            "data_loss": data_loss / mc_samples,
            "kl": kl,
        }
        return new_state, out_metrics

    def sample(state: MethodState, key, index=None):
        # Layers sample themselves in the forward pass (reference
        # bbb.py:92-96) — the prediction key drives the noise stream.
        del key, index
        return state.params, state.model_state

    return PosteriorMethod(
        init=init,
        update=update,
        sample=sample,
        finalize_epoch=default_finalize_epoch,
        sample_is_identity=True,
    )
