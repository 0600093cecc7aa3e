"""Last-layer Bayesian composition.

Reference LastLayerBayesianOptimizer (src/algos/algo.py:83-133): a
Bayesian optimizer over the model head composed with a deterministic
optimizer over the backbone — the WILDS tasks' swag_ll / ll_svgd /
ll_ivon / ll_bbb variants (SURVEY.md §2.5, iwildcam/models.py:87-154).

Functional design: parameters are split by a last-layer mask into two
full-structure trees where the "other side" of each leaf is a zero-size
placeholder (shape (0,)). The placeholder shapes themselves encode the
mask — no non-hashable mask state needs to ride in the method state.
The inner PosteriorMethod owns only the head tree; it is (re)constructed
per trace with the current backbone closed over, so the backbone threads
through explicit function arguments — no mutable rebind box, safe under
separate jits of ``update``/``sample`` and with interleaved last-layer
methods.

Backbone gradients are taken by differentiating *through* the inner
update's loss metric, so XLA shares the network forward between the head
step and the backbone step — the functional analogue of the reference
accumulating every inner backward pass into the backbone grads
(algo.py:96-99): one full forward + one full backward per step, not two
forwards.
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

    The inner method is rebuilt per call with the current backbone closed
    over (pure closure construction at trace time — each of init/update/
    sample traces its own inner, so there is no cross-call mutable state).

    head_particles > 0: the inner method runs over a STACKED head
    (last-layer SVGD, reference iwildcam ll_svgd models.py:123-154);
    particle heads are independently re-initialized by perturbing the
    trained init, and the backbone gradient averages over particles
    (the reference accumulated every particle's backward pass into the
    backbone grads, algo.py:96-99 + svgd.py:67-80).
    """

    def make_inner(backbone) -> PosteriorMethod:
        def head_loss_fn(head_params, model_state, key, batch, **kw):
            full = merge_params(backbone, head_params)
            return loss_fn(full, model_state, key, batch, **kw)

        return inner_factory(head_loss_fn)

    def init(key, params, model_state=None):
        mask = mask_fn(params)
        backbone, head = split_params(params, mask)
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
        inner_state = make_inner(backbone).init(k_inner, head, model_state)
        return LastLayerState(
            inner=inner_state,
            backbone=backbone,
            backbone_opt=backbone_tx.init(backbone),
            step=jnp.int32(0),
            epoch=jnp.int32(0),
        )

    def update(state: LastLayerState, key, batch):
        k_inner, _ = jax.random.split(key)

        # One differentiable pass: the Bayesian head step (reference
        # algo.py:96-97) whose loss metric is differentiated w.r.t. the
        # backbone — XLA shares the forward between head-grad and
        # backbone-grad, matching the reference's reuse of the inner
        # backward passes for the backbone update (algo.py:98-99).
        # Inner methods that run SEVERAL backward passes per step (SVGD
        # particles, iVON MC samples) report ``backbone_loss`` — the SUM
        # whose gradient equals the reference's grad accumulation into the
        # deterministic optimizer's params (algo.py:100-104) — because the
        # mean would shrink the backbone gradient by the pass count, which
        # changes the Adam update whenever weight decay is non-zero.
        def joint(backbone):
            inner_state, metrics = make_inner(backbone).update(
                state.inner, k_inner, batch
            )
            return metrics.get("backbone_loss", metrics["loss"]), (
                inner_state,
                metrics,
            )

        grads, (inner_state, metrics) = jax.grad(joint, has_aux=True)(state.backbone)
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
        head, model_state = make_inner(state.backbone).sample(state.inner, key, index)
        return merge_params(state.backbone, head), model_state

    def finalize_epoch(state: LastLayerState):
        # finalize hooks never evaluate the loss; any backbone works here.
        inner = make_inner(state.backbone)
        return state.replace(
            inner=inner.finalize_epoch(state.inner), epoch=state.epoch + 1
        )

    probe = inner_factory(
        lambda head_params, model_state, key, batch, **kw: loss_fn(
            head_params, model_state, key, batch, **kw
        )
    )
    return PosteriorMethod(
        init=init,
        update=update,
        sample=sample,
        finalize_epoch=finalize_epoch,
        sample_is_identity=probe.sample_is_identity,
        multisample=probe.multisample,
    )
