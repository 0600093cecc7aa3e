"""The posterior-method protocol and shared variational machinery.

Reference counterpart: ``BayesianOptimizer`` with its
``step(forward_closure, backward_closure, grad_scaler)`` contract
(reference src/algos/algo.py:5-81). The closure protocol existed so that
algorithms could re-run forward/backward several times per step (BBB
mc_samples, iVON sampling, SVGD particles). Here the algorithm receives a
jittable ``loss_fn(params, model_state, key, batch) -> LossOutput`` and may
call / ``vmap`` / ``lax.scan`` it as many times as it wants *inside one
compiled step* — no host round trips, no GradScaler (bf16 compute + fp32
state needs none; the reference's AMP plumbing algo.py:44-80 has no
TPU-native counterpart by design).

Naming conventions for variational parameters (used instead of the
reference's attribute tags ``_is_gaussian_mean`` / ``_is_gaussian_rho`` /
``get_parameter_kl`` hooks, reference src/algos/util.py:151-189):

  * a Gaussian variational parameter ``w`` is stored as two leaves named
    ``{w}__gmean`` and ``{w}__grho`` (std = softplus(rho));
  * a parameter trained by MLE only (excluded from VI/SVGD param space,
    reference util.py:72-73 ``use_mle_training``) carries the suffix
    ``__mle``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

Params = Any
ModelState = Any  # flax mutable collections (batch stats, sngp precision, ...)
Batch = Any

GMEAN_SUFFIX = "__gmean"
GRHO_SUFFIX = "__grho"
MLE_SUFFIX = "__mle"


class LossOutput(NamedTuple):
    """Return value of a loss function.

    loss:        scalar data loss (mean over the batch).
    kl:          extra KL sown by layers in the forward pass (LowRank BBB
                 head etc.); ``0.`` when none. Closed-form Gaussian KL of
                 ``__gmean``/``__grho`` pairs is computed by the method
                 itself (reference bbb.py:70-76), not here.
    model_state: updated mutable model state (batch stats, SNGP precision).
    metrics:     auxiliary scalars for logging.
    """

    loss: jax.Array
    kl: jax.Array = 0.0
    model_state: ModelState = None
    metrics: dict = {}


LossFn = Callable[..., LossOutput]  # (params, model_state, key, batch) -> LossOutput


class MethodState(struct.PyTreeNode):
    """Common chassis for posterior-method state. Methods extend this."""

    params: Params
    model_state: ModelState
    opt_state: Any
    step: jax.Array  # int32 scalar
    epoch: jax.Array  # int32 scalar


@dataclasses.dataclass(frozen=True)
class PosteriorMethod:
    """A Bayesian training/prediction algorithm as pure functions.

    init(key, params, model_state) -> state
        Build method state around initial model params.
    update(state, key, batch) -> (state, metrics)
        One optimization step; fully jittable. CONTRACT:
        ``metrics['loss']`` must be the pre-update minibatch loss as a
        differentiable function of the parameters the loss was evaluated
        at — not ``stop_gradient``-ed, not recomputed post-update, not
        rescaled relative to the data term. ``last_layer_method``
        differentiates it w.r.t. the backbone to share one forward+
        backward between the head and backbone steps; a detached loss
        would silently zero the backbone gradient
        (tests/test_composition.py asserts backbone movement per inner
        method). Methods that run SEVERAL backward passes per step
        (SVGD particles, iVON MC samples) additionally report
        ``metrics['backbone_loss']`` — the SUM of the per-pass losses —
        which ``last_layer_method`` prefers: the reference's
        deterministic backbone accumulates every inner backward
        (algo.py:100-104), so its gradient is the sum, not the mean.
    sample(state, key) -> (params, model_state)
        Draw parameters from the posterior for one prediction
        (reference ``sample_parameters``, algo.py:31-36). Methods whose
        models sample internally (BBB/MCD) return the live params.
    finalize_epoch(state) -> state
        Epoch-boundary hook (SWAG epoch counter swag.py:60-61, SNGP
        precision reset sngp.py:263-264).

    sample_is_identity: when True, ``sample`` ignores the key and returns
        state params — prediction code can then avoid materializing S
        copies of the parameters.
    multisample: model supports drawing all S predictive samples in one
        forward (reference ``supports_multisample``, sngp.py:212).
    """

    init: Callable[[jax.Array, Params, ModelState], MethodState]
    update: Callable[[MethodState, jax.Array, Batch], tuple[MethodState, dict]]
    sample: Callable[[MethodState, jax.Array], tuple[Params, ModelState]]
    finalize_epoch: Callable[[MethodState], MethodState] = lambda s: s
    sample_is_identity: bool = False
    multisample: bool = False


def default_finalize_epoch(state: MethodState) -> MethodState:
    return state.replace(epoch=state.epoch + 1)


# ---------------------------------------------------------------------------
# Priors (reference src/algos/bbb.py:9-37)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GaussianPrior:
    """N(mu, sigma) prior with the reference's closed-form KL
    (reference bbb.py:18-21; note the reference formula *is* KL(q||p))."""

    mu: float = 0.0
    sigma: float = 1.0

    def log_prob(self, x):
        return (
            -((x - self.mu) ** 2) / (2 * self.sigma**2)
            - math.log(self.sigma)
            - 0.5 * math.log(2 * math.pi)
        )

    def kl_divergence(self, mu_q, sigma_q):
        kl = 0.5 * (
            2 * jnp.log(self.sigma / sigma_q)
            - 1
            + (sigma_q / self.sigma) ** 2
            + ((self.mu - mu_q) / self.sigma) ** 2
        )
        return jnp.sum(kl)


@dataclasses.dataclass(frozen=True)
class MixturePrior:
    """Blundell scale-mixture prior. ``kl_divergence`` deliberately matches
    the reference's surrogate: -log p(mu_q), ignoring sigma_q
    (reference bbb.py:36-37), with per-component log-probs clamped to
    [-23, 0] (reference bbb.py:32-33)."""

    pi: float = 0.5
    sigma1: float = 1.0
    sigma2: float = 0.01

    def log_prob(self, value):
        def comp(sigma):
            lp = (
                -(value**2) / (2 * sigma**2)
                - math.log(sigma)
                - 0.5 * math.log(2 * math.pi)
            )
            return jnp.clip(lp, -23.0, 0.0)

        prob1 = math.log(self.pi) + comp(self.sigma1)
        prob2 = math.log(1 - self.pi) + comp(self.sigma2)
        return jnp.logaddexp(prob1, prob2)

    def kl_divergence(self, mu_q, sigma_q):
        del sigma_q
        return -jnp.sum(self.log_prob(mu_q))


def to_sigma(rho):
    """std = softplus(rho) (reference bbb_layers.py:262-263)."""
    return jax.nn.softplus(rho)


def softplus_inverse(x):
    return jnp.log(jnp.expm1(x))


def gaussian_kl(mu_q, sig_q, mu_p, sig_p):
    """Closed-form KL(q || p) between diagonal Gaussians
    (reference bbb_layers.py:274-276)."""
    kl = 0.5 * (
        2 * jnp.log(sig_p / sig_q)
        - 1
        + (sig_q / sig_p) ** 2
        + ((mu_p - mu_q) / sig_p) ** 2
    )
    return jnp.sum(kl)


# ---------------------------------------------------------------------------
# Param-tree partitioning by naming convention
# ---------------------------------------------------------------------------


def _path_name(path) -> str:
    p = path[-1]
    return getattr(p, "key", getattr(p, "name", str(p)))


def split_gaussian_labels(params: Params):
    """Label every leaf as 'gmean' / 'grho' / 'mle' / 'plain'.

    Replaces the reference's per-parameter attribute tags
    (util.py:151-189) with a pure path inspection. Returns a pytree of
    labels with the same structure as ``params``.
    """

    def label(path, leaf):
        del leaf
        name = _path_name(path)
        if name.endswith(GMEAN_SUFFIX):
            return "gmean"
        if name.endswith(GRHO_SUFFIX):
            return "grho"
        if name.endswith(MLE_SUFFIX):
            return "mle"
        return "plain"

    return jax.tree_util.tree_map_with_path(label, params)


def collect_gaussian_kl(params: Params, prior) -> jax.Array:
    """Sum of closed-form KL(q||prior) over all Gaussian variational
    parameters in the tree (reference bbb.py:70-76 KL collection)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_name = {}
    for path, leaf in flat:
        name = _path_name(path)
        prefix = tuple(_path_name((p,)) for p in path[:-1])
        if name.endswith(GMEAN_SUFFIX):
            by_name.setdefault(prefix + (name[: -len(GMEAN_SUFFIX)],), {})["mean"] = leaf
        elif name.endswith(GRHO_SUFFIX):
            by_name.setdefault(prefix + (name[: -len(GRHO_SUFFIX)],), {})["rho"] = leaf
    kl = jnp.float32(0.0)
    for pair in by_name.values():
        if "mean" in pair and "rho" in pair:
            kl = kl + prior.kl_divergence(pair["mean"], to_sigma(pair["rho"]))
    return kl


def l2_of_plain_params(params: Params) -> jax.Array:
    """0.5 * sum of squares over non-Gaussian, non-MLE parameters
    (reference bbb.py:75-76)."""
    labels = split_gaussian_labels(params)
    total = jnp.float32(0.0)
    for leaf, lab in zip(jax.tree.leaves(params), jax.tree.leaves(labels)):
        if lab == "plain":
            total = total + 0.5 * jnp.sum(leaf.astype(jnp.float32) ** 2)
    return total


def non_mle_mask(params: Params) -> Params:
    """Boolean mask pytree: True for params that participate in
    parameter-space VI/SVGD (reference util.py:188-189 non_mle_params)."""
    labels = split_gaussian_labels(params)
    return jax.tree.map(lambda lab: lab != "mle", labels)
