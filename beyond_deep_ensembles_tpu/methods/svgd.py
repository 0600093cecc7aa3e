"""SVGD: Stein Variational Gradient Descent.

Reference SVGDOptimizer (src/algos/svgd.py). TPU-native redesign:

  * particles are a leading axis of ONE stacked parameter pytree; the
    reference's sequential per-particle forward/backward (svgd.py:67-80)
    becomes ``vmap(value_and_grad(loss))`` — n particles' gradients in one
    XLA program, MC-batched onto the MXU;
  * the (n, P) flatten uses reshape+concat (vmap-safe), not host-side
    ``parameters_to_vector`` (svgd.py:83-84);
  * the RBF kernel with the median heuristic (svgd.py:14-32) runs
    on-device; the O(n^2 P) pairwise distances are one Gram matmul. A
    fused Pallas kernel for the phi computation lives in
    ``ops.svgd_kernel`` (used automatically for large P).

Parameters whose names carry the ``__mle`` suffix (GaussLayer's learned
variance) are excluded from the Stein update and receive plain gradients,
mirroring the reference's ``non_mle_params`` filter + separate
var-optimizer (reference util.py:188-189, experiments/uci/models.py:17-21).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.svgd_kernel import rbf_phi
from ..tree import make_unravel, ravel
from .api import LossFn, PosteriorMethod, default_finalize_epoch, non_mle_mask


class SvgdState(struct.PyTreeNode):
    params: any  # stacked particle pytree, leading axis n
    model_state: any
    opt_state: any  # stacked per-particle optimizer state
    step: jax.Array
    epoch: jax.Array


def rbf(particles: jax.Array, h_override=None):
    """RBF kernel + analytic kernel gradient with the median heuristic
    (reference svgd.py:14-32). particles: [n, P]."""
    n = particles.shape[0]
    sq_norms = jnp.sum(particles * particles, axis=1)
    gram = particles @ particles.T
    d2 = jnp.maximum(sq_norms[:, None] + sq_norms[None, :] - 2 * gram, 0.0)

    if h_override is None:
        # torch.quantile(d2, 0.5) — linear interpolation over all n^2
        # entries (reference svgd.py:18).
        flat = jnp.sort(d2.reshape(-1))
        pos = 0.5 * (flat.shape[0] - 1)
        lo = int(pos)
        frac = pos - lo
        median = flat[lo] * (1 - frac) + flat[min(lo + 1, flat.shape[0] - 1)] * frac
        h = jnp.sqrt(0.5 * median / jnp.log(n + 1.0)) + 1e-8
    else:
        h = h_override

    kernel = jnp.exp(-d2 / (2 * h**2))
    grad_kernel = (
        jnp.sum(kernel, axis=1)[:, None] * particles - kernel @ particles
    ) / h**2
    return kernel, grad_kernel


def svgd_method(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    particle_count: int,
    dataset_size: int,
    l2_reg: float = 0.0,
    kernel_grad_scale: float = 1.0,
    use_pallas: bool | None = None,
    model_state_stacked: bool | None = None,
) -> PosteriorMethod:
    def init(key, params, model_state=None):
        """``params`` must already be STACKED with leading particle axis
        (build with ``vmap(model.init)`` over ``particle_count`` keys —
        the reference re-initialized the module per particle,
        svgd.py:58-63).

        ``model_state`` (batch stats, SNGP precision) is stored stacked
        per-particle too — each particle's forward updates its own
        statistics. An unstacked tree (e.g. from a single ``model.init``)
        is broadcast to all particles. The stacked/unstacked distinction
        is inferred from every leaf's leading dim equaling
        ``particle_count``; that heuristic is ambiguous when a genuinely
        unstacked state's leaves ALL happen to have that leading dim
        (e.g. uniform particle_count-channel layers) — pass the explicit
        ``model_state_stacked`` knob to svgd_method in that case."""
        del key
        n = jax.tree.leaves(params)[0].shape[0]
        assert n == particle_count, f"expected {particle_count} particles, got {n}"
        if model_state is None or not jax.tree.leaves(model_state):
            model_state = {}
        else:
            stacked = (
                model_state_stacked
                if model_state_stacked is not None
                else all(
                    hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == n
                    for l in jax.tree.leaves(model_state)
                )
            )
            if not stacked:
                model_state = jax.tree.map(
                    lambda l: jnp.broadcast_to(l, (n,) + jnp.shape(l)), model_state
                )
        return SvgdState(
            params=params,
            model_state=model_state,
            opt_state=jax.vmap(tx.init)(params),
            step=jnp.int32(0),
            epoch=jnp.int32(0),
        )

    def update(state: SvgdState, key, batch):
        keys = jax.random.split(key, particle_count)
        has_model_state = bool(jax.tree.leaves(state.model_state))

        def one_loss(params, k, model_state):
            out = loss_fn(params, model_state, k, batch)
            return out.loss, out

        (losses, outs), grads = jax.vmap(
            jax.value_and_grad(one_loss, has_aux=True),
            in_axes=(0, 0, 0 if has_model_state else None),
        )(state.params, keys, state.model_state if has_model_state else None)

        particle_mat = jax.vmap(ravel)(state.params)  # [n, P]
        grad_mat = jax.vmap(ravel)(grads)  # [n, P]
        # Prior as L2 (reference svgd.py:86).
        grad_mat = grad_mat + (l2_reg / 2.0) * particle_mat

        phi = rbf_phi(
            particle_mat,
            grad_mat,
            kernel_grad_scale=kernel_grad_scale,
            dataset_size=dataset_size,
            use_pallas=use_pallas,
        )

        # Stein update direction: optimizer descends along -phi
        # (reference svgd.py:89-95 writes -phi into .grad).
        unravel = make_unravel(jax.tree.map(lambda l: l[0], state.params))
        stein_grads = jax.vmap(unravel)(-phi)
        # __mle leaves bypass the Stein transport and take raw gradients.
        mask = non_mle_mask(jax.tree.map(lambda l: l[0], state.params))
        final_grads = jax.tree.map(
            lambda m, sg, g: sg if m else g, mask, stein_grads, grads
        )

        updates, opt_state = jax.vmap(tx.update)(
            final_grads, state.opt_state, state.params
        )
        new_params = jax.vmap(optax.apply_updates)(state.params, updates)

        # Skip the whole update if any gradient is non-finite
        # (reference svgd.py:78-79 via GradScaler inf check).
        ok = jnp.all(jnp.isfinite(grad_mat))
        pick = lambda n_, o_: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b) if isinstance(a, jax.Array) else a, n_, o_
        )
        # Explicit None/empty check — NOT pytree truthiness, which would
        # evaluate traced leaves. The vmapped loss returns model state
        # stacked per-particle; keep it stacked (each particle trains its
        # own batch stats; reference trains particles sequentially through
        # the same module, svgd.py:67-80).
        new_ms = outs.model_state
        if new_ms is None or not jax.tree.leaves(new_ms):
            model_state = state.model_state
        else:
            model_state = new_ms
        new_state = state.replace(
            params=pick(new_params, state.params),
            model_state=model_state,
            opt_state=pick(opt_state, state.opt_state),
            step=state.step + 1,
        )
        # ``backbone_loss``: when composed under last_layer_method, the
        # reference's deterministic backbone accumulates EVERY particle's
        # backward pass (algo.py:100-104 zero_grads once, then
        # svgd.py:66-80 runs n fwd/bwd; the head-only base optimizer's
        # zero_grad does not touch backbone grads) — i.e. the backbone
        # gradient is the SUM over particles, not the mean. The user-facing
        # "loss" stays the mean (reference step returns total/count,
        # svgd.py:105).
        return new_state, {
            "loss": jnp.mean(losses),
            "backbone_loss": jnp.sum(losses),
        }

    def sample(state: SvgdState, key, index=None):
        """Cycle through particles (reference svgd.py:107-112); the
        prediction index selects the particle (and its model state)."""
        del key
        if index is None:
            index = 0
        member = jnp.asarray(index) % particle_count
        params = jax.tree.map(lambda l: l[member], state.params)
        model_state = jax.tree.map(lambda l: l[member], state.model_state)
        return params, model_state

    return PosteriorMethod(
        init=init,
        update=update,
        sample=sample,
        finalize_epoch=default_finalize_epoch,
    )
