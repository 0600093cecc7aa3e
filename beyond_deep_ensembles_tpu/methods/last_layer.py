"""Last-layer Bayesian composition.

Reference LastLayerBayesianOptimizer (src/algos/algo.py:83-133): a
Bayesian optimizer over the model head composed with a deterministic
optimizer over the backbone — the WILDS tasks' swag_ll / ll_svgd /
ll_ivon / ll_bbb variants (SURVEY.md §2.5, iwildcam/models.py:87-154).

Functional design: parameters are split by a last-layer mask into two
full-structure trees where the "other side" of each leaf is a zero-size
placeholder (shape (0,)). The placeholder shapes themselves encode the
mask — no non-hashable mask state needs to ride in the method state.
The inner PosteriorMethod owns only the head tree; the backbone is
updated by a plain optax transformation using gradients from one extra
fused forward at the pre-update head (the reference reuses the inner
step's accumulated backward gradients, algo.py:96-99 — same fixed point,
simpler composition).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .api import LossFn, PosteriorMethod
from .laplace import last_layer_mask


def split_params(params, mask):
    """(backbone, head): full-structure trees; the other side's leaves are
    zero-size placeholders whose emptiness encodes the mask."""
    head = jax.tree.map(lambda p, m: p if m else jnp.zeros((0,), p.dtype), params, mask)
    backbone = jax.tree.map(lambda p, m: jnp.zeros((0,), p.dtype) if m else p, params, mask)
    return backbone, head


def merge_params(backbone, head):
    """Inverse of split: pick the non-empty leaf (static shape check)."""
    return jax.tree.map(lambda b, h: h if b.size == 0 else b, backbone, head)


class LastLayerState(struct.PyTreeNode):
    inner: Any  # inner MethodState over the head-or-placeholder tree
    backbone: Any  # backbone-or-placeholder tree
    backbone_opt: Any
    step: jax.Array
    epoch: jax.Array

    @property
    def params(self):
        return merge_params(self.backbone, self.inner.params)

    @property
    def model_state(self):
        return self.inner.model_state


def last_layer_method(
    loss_fn: LossFn,
    inner_factory: Callable[[LossFn], PosteriorMethod],
    backbone_tx: optax.GradientTransformation,
    mask_fn: Callable = last_layer_mask,
    head_particles: int = 0,
) -> PosteriorMethod:
    """inner_factory(head_loss_fn) -> PosteriorMethod over the head tree.

    head_loss_fn merges the (frozen, current) backbone into the head tree
    before the forward; the backbone is threaded through a rebind box,
    read only while tracing the enclosing update call.

    head_particles > 0: the inner method runs over a STACKED head
    (last-layer SVGD, reference iwildcam ll_svgd models.py:123-154);
    particle heads are independently re-initialized by perturbing the
    trained init, and the backbone gradient averages over particles
    (the reference accumulated every particle's backward pass into the
    backbone grads, algo.py:96-99 + svgd.py:67-80).
    """
    _ctx = {}

    def head_loss_fn(head_params, model_state, key, batch, **kw):
        full = merge_params(_ctx["backbone"], head_params)
        return loss_fn(full, model_state, key, batch, **kw)

    inner = inner_factory(head_loss_fn)

    def init(key, params, model_state=None):
        mask = mask_fn(params)
        backbone, head = split_params(params, mask)
        _ctx["backbone"] = backbone
        k_inner, k_stack = jax.random.split(key)
        if head_particles:
            keys = jax.random.split(k_stack, head_particles)
            heads = []
            for k in keys:
                noise_keys = jax.random.split(k, len(jax.tree.leaves(head)))
                heads.append(
                    jax.tree.unflatten(
                        jax.tree.structure(head),
                        [
                            l + l.std() * jax.random.normal(nk, l.shape) if l.size else l
                            for l, nk in zip(jax.tree.leaves(head), noise_keys)
                        ],
                    )
                )
            head = jax.tree.map(lambda *ls: jnp.stack(ls), *heads)
        inner_state = inner.init(k_inner, head, model_state)
        return LastLayerState(
            inner=inner_state,
            backbone=backbone,
            backbone_opt=backbone_tx.init(backbone),
            step=jnp.int32(0),
            epoch=jnp.int32(0),
        )

    def update(state: LastLayerState, key, batch):
        _ctx["backbone"] = state.backbone
        k_inner, k_back = jax.random.split(key)

        # 1) Bayesian step on the head (reference algo.py:96-97).
        inner_state, metrics = inner.update(state.inner, k_inner, batch)

        # 2) Deterministic step on the backbone at the pre-update head
        # (reference algo.py:98-99).
        def backbone_loss(backbone):
            if head_particles:
                losses = jax.vmap(
                    lambda h: loss_fn(
                        merge_params(backbone, h), state.inner.model_state, k_back, batch
                    ).loss
                )(state.inner.params)
                return jnp.mean(losses)
            full = merge_params(backbone, state.inner.params)
            out = loss_fn(full, state.inner.model_state, k_back, batch)
            return out.loss

        grads = jax.grad(backbone_loss)(state.backbone)
        updates, backbone_opt = backbone_tx.update(
            grads, state.backbone_opt, state.backbone
        )
        backbone = optax.apply_updates(state.backbone, updates)
        return (
            state.replace(
                inner=inner_state,
                backbone=backbone,
                backbone_opt=backbone_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    def sample(state: LastLayerState, key, index=None):
        _ctx["backbone"] = state.backbone
        head, model_state = inner.sample(state.inner, key, index)
        return merge_params(state.backbone, head), model_state

    def finalize_epoch(state: LastLayerState):
        return state.replace(
            inner=inner.finalize_epoch(state.inner), epoch=state.epoch + 1
        )

    return PosteriorMethod(
        init=init,
        update=update,
        sample=sample,
        finalize_epoch=finalize_epoch,
        sample_is_identity=inner.sample_is_identity,
        multisample=inner.multisample,
    )
