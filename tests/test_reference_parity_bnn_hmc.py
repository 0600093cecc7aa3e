"""Differential parity against the LIVE vendored bnn-hmc subtree
(google-bnn-hmc, JAX/Haiku): leapfrog trajectories and the RMSProp
preconditioner are deterministic, so both implementations are driven
with identical inputs and compared exactly.

The vendored code predates jax 0.9 (uses the removed jax.tree_map /
jax.tree_leaves aliases); a two-line alias shim restores them so the
reference logic itself runs unmodified."""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/google-bnn-hmc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# compat shim for the vendored pre-0.9 reference code (aliases only —
# identical semantics; the reference logic is untouched)
if not hasattr(jax, "tree_map"):
    jax.tree_map = jax.tree.map
if not hasattr(jax, "tree_leaves"):
    jax.tree_leaves = jax.tree.leaves


def _quad_logprob(params):
    """Anisotropic Gaussian potential: log p = -0.5 sum(w * p^2)."""
    return -0.5 * (
        jnp.sum(jnp.asarray([1.0, 4.0, 0.25]) * params["a"] ** 2)
        + jnp.sum(2.0 * params["b"] ** 2)
    )


def test_leapfrog_trajectory_matches_reference():
    from bnn_hmc.core.hmc import make_leapfrog

    from beyond_deep_ensembles_tpu.methods.hmc import leapfrog

    grad_of = jax.grad(_quad_logprob)

    def ref_log_prob_and_grad(dataset, params, net_state):
        lp = _quad_logprob(params)
        return lp, grad_of(params), lp, net_state

    rng = np.random.RandomState(0)
    params0 = {
        "a": jnp.asarray(rng.randn(3), jnp.float32),
        "b": jnp.asarray(rng.randn(2, 2), jnp.float32),
    }
    momentum0 = {
        "a": jnp.asarray(rng.randn(3), jnp.float32),
        "b": jnp.asarray(rng.randn(2, 2), jnp.float32),
    }
    grad0 = grad_of(params0)
    step_size, n_steps = 0.1, 25

    ref_leap = make_leapfrog(ref_log_prob_and_grad)
    ref_p, _, ref_m, ref_g, ref_ll = ref_leap(
        None, params0, None, momentum0, grad0, jnp.float32(step_size),
        jnp.int32(n_steps),
    )

    def our_grad_fn(params):
        lp = _quad_logprob(params)
        return (lp, (lp, None)), grad_of(params)

    our_p, our_m, our_g, our_ll = leapfrog(
        our_grad_fn, params0, momentum0, grad0, _quad_logprob(params0),
        jnp.float32(step_size), n_steps,
    )

    for k in ("a", "b"):
        np.testing.assert_allclose(np.asarray(our_p[k]), np.asarray(ref_p[k]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(our_m[k]), np.asarray(ref_m[k]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(our_g[k]), np.asarray(ref_g[k]), rtol=1e-6)
    np.testing.assert_allclose(float(our_ll), float(ref_ll), rtol=1e-6)


def test_rmsprop_preconditioner_matches_reference():
    from bnn_hmc.core.sgmcmc import get_rmsprop_preconditioner

    from beyond_deep_ensembles_tpu.methods.sgmcmc import RMSPreconditioner

    rng = np.random.RandomState(1)
    params = {"w": jnp.zeros((4,)), "b": jnp.zeros((2,))}
    grads = [
        {"w": jnp.asarray(rng.randn(4), jnp.float32),
         "b": jnp.asarray(rng.randn(2), jnp.float32)}
        for _ in range(5)
    ]
    vec = {"w": jnp.asarray(rng.randn(4), jnp.float32),
           "b": jnp.asarray(rng.randn(2), jnp.float32)}

    ref = get_rmsprop_preconditioner()
    ref_state = ref.init(params)
    for g in grads:
        ref_state = ref.update_preconditioner(g, ref_state)

    ours = RMSPreconditioner()
    our_state = ours.init(params)
    for g in grads:
        our_state = ours.update(g, our_state)

    for name, ref_fn, our_fn in [
        ("m_inv", ref.multiply_by_m_inv, ours.m_inv),
        ("m_sqrt", ref.multiply_by_m_sqrt, ours.m_sqrt),
    ]:
        r = ref_fn(vec, ref_state)
        o = our_fn(vec, our_state)
        for k in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(o[k]), np.asarray(r[k]), rtol=1e-6, err_msg=name
            )


def test_losses_match_reference():
    """Tempered xent / Gaussian prior / heteroscedastic likelihood vs the
    LIVE vendored losses.py. Note: the reference log-prior carries a
    sign quirk on its (parameter-independent) normalization constant
    (losses.py:60-62 subtracts 0.5 n log(wd/2pi) where the true density
    adds it), so the prior is compared through parameter-dependent
    differences — exactly what HMC/SGMCMC consume."""
    import math

    from bnn_hmc.utils import losses as ref_losses

    from beyond_deep_ensembles_tpu.evals.losses import (
        gaussian_log_prior,
        gaussian_log_prior_diff,
        heteroscedastic_gaussian_ll,
        tempered_softmax_xent,
    )

    rng = np.random.RandomState(4)

    # tempered cross-entropy: ours is the mean NLL / T, theirs the summed LL / T
    logits = jnp.asarray(rng.randn(6, 4), jnp.float32)
    y = jnp.asarray(rng.randint(0, 4, 6))
    T = 2.0
    ref_ll, _ = ref_losses.make_xent_log_likelihood(T)(
        lambda p, s, _, b, t: (logits, s), None, None, (None, y), True
    )
    ours = tempered_softmax_xent(logits, y, temperature=T)
    np.testing.assert_allclose(float(ref_ll), -float(ours) * 6, rtol=1e-6)

    # Gaussian prior: parameter-dependent parts + the diff fn
    wd, T = 3.0, 1.0
    prior_std = 1.0 / math.sqrt(wd)
    p1 = {"w": jnp.asarray(rng.randn(5), jnp.float32)}
    p2 = {"w": jnp.asarray(rng.randn(5), jnp.float32)}
    ref_lp, ref_lpd = ref_losses.make_gaussian_log_prior(wd, T)
    np.testing.assert_allclose(
        float(ref_lp(p1)) - float(ref_lp(p2)),
        float(gaussian_log_prior(p1, prior_std)) - float(gaussian_log_prior(p2, prior_std)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(ref_lpd(p1, p2)),
        float(gaussian_log_prior_diff(p1, p2, prior_std)),
        rtol=1e-5,
    )

    # heteroscedastic Gaussian likelihood (mean, pre-softplus std) pairs
    outputs = jnp.asarray(rng.randn(8, 2), jnp.float32)
    targets = jnp.asarray(rng.randn(8, 1), jnp.float32)
    ref_gll, _ = ref_losses.make_gaussian_likelihood(1.0)(
        lambda p, s, _, b, t: (outputs, s), None, None, (None, targets), True
    )
    ours_ll = heteroscedastic_gaussian_ll(outputs, targets[:, 0], min_std=0.0)
    np.testing.assert_allclose(float(ref_gll), float(jnp.sum(ours_ll)), rtol=1e-5)


def test_mfvi_kl_matches_reference():
    """MFVI's Gaussian prior-KL term vs the live reference kl_fn
    (core/vi.py:104-131; reference returns -KL * temperature)."""
    from bnn_hmc.core.vi import make_kl_with_gaussian_prior

    from beyond_deep_ensembles_tpu.methods.vi import _gauss_kl_iso

    rng = np.random.RandomState(3)
    mean = {"w": jnp.asarray(rng.randn(4, 3), jnp.float32),
            "b": jnp.asarray(rng.randn(3), jnp.float32)}
    rho = {"w": jnp.asarray(-1 + 0.3 * rng.randn(4, 3), jnp.float32),
           "b": jnp.asarray(-2 + 0.3 * rng.randn(3), jnp.float32)}
    prior_std, temperature = 1.7, 0.5

    ref_kl_fn = make_kl_with_gaussian_prior(
        weight_decay=1.0 / prior_std**2, temperature=temperature
    )
    ref = float(ref_kl_fn({"mean": mean, "inv_softplus_std": rho}))

    ours = float(_gauss_kl_iso(mean, rho, prior_std))
    np.testing.assert_allclose(-ours * temperature, ref, rtol=1e-6)


def test_hmc_accept_prob_matches_reference():
    """MH acceptance probability on matched (loglik, params, momentum)
    pairs — covers the kinetic-energy and prior-difference conventions
    (reference hmc.py:79-96)."""
    from bnn_hmc.core.hmc import make_accept_prob

    prior_std = 1.3

    def ref_log_prior_diff(p1, p2):
        return sum(
            jnp.sum(a**2 - b**2)
            for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))
        ) * (-0.5 / prior_std**2)

    get_accept = make_accept_prob(ref_log_prior_diff)

    rng = np.random.RandomState(2)
    p1 = {"w": jnp.asarray(rng.randn(5), jnp.float32)}
    p2 = {"w": jnp.asarray(rng.randn(5), jnp.float32)}
    m1 = {"w": jnp.asarray(rng.randn(5), jnp.float32)}
    m2 = {"w": jnp.asarray(rng.randn(5), jnp.float32)}
    ll1, ll2 = jnp.float32(-40.0), jnp.float32(-38.5)

    ref_prob = float(get_accept(ll1, p1, m1, ll2, p2, m2))

    # our update computes the same quantity inline (methods/hmc.py:127-137);
    # recompute via our tree helpers to pin the convention
    from beyond_deep_ensembles_tpu import tree

    kinetic = 0.5 * (tree.tree_sq_norm(m1) - tree.tree_sq_norm(m2))
    log_prior = lambda p: -tree.tree_sq_norm(p) / (2 * prior_std**2)
    energy_diff = kinetic - (ll1 - ll2) - (log_prior(p1) - log_prior(p2))
    our_prob = float(jnp.minimum(1.0, jnp.exp(energy_diff)))
    np.testing.assert_allclose(our_prob, ref_prob, rtol=1e-6)


def test_step_size_adaptation_recursion_matches_reference():
    """The multiplicative step-size adaptation (vendored core/hmc.py:99-104
    adapt_step_size) drives burn-in; run the LIVE vendored recursion over a
    sequence of accept probabilities and assert our HmcState step-size
    trajectory (methods/hmc.py update: step_size * exp(speed * (p - target)),
    gated on target>0 and speed>0) reproduces it exactly."""
    from bnn_hmc.core import hmc as ref_hmc

    rng = np.random.RandomState(3)
    probs = rng.uniform(0.0, 1.0, size=50).astype(np.float32)

    for target, speed in [(0.9, 0.05), (0.8, 0.25), (0.0, 0.05), (0.9, 0.0)]:
        ref_ss, our_ss = 1e-4, jnp.float32(1e-4)
        for p in probs:
            ref_ss = float(
                ref_hmc.adapt_step_size(
                    jnp.float32(ref_ss), target, jnp.float32(p), speed
                )
            )
            our_ss = jnp.where(
                (target > 0) & (speed > 0),
                our_ss * jnp.exp(speed * (jnp.float32(p) - target)),
                our_ss,
            )
        np.testing.assert_allclose(
            float(our_ss), ref_ss, rtol=1e-6,
            err_msg=f"target={target} speed={speed}",
        )


def test_hmc_update_step_size_matches_vendored_adaptation():
    """Bind OUR HmcState.update to the vendored rule: run one real HMC
    update (quadratic potential), read back its reported accept_prob, and
    assert the new step size equals the LIVE vendored
    adapt_step_size(old, target, accept_prob, speed)."""
    import optax  # noqa: F401  (parity imports follow suite convention)
    from bnn_hmc.core import hmc as ref_hmc

    from beyond_deep_ensembles_tpu.methods import hmc as our_hmc
    from beyond_deep_ensembles_tpu.methods.api import LossOutput

    target, speed, step_size = 0.9, 0.1, 5e-2

    def loss_fn(params, model_state, key, batch):
        return LossOutput(loss=0.5 * jnp.sum(params["w"] ** 2))

    method = our_hmc.hmc_method(
        loss_fn,
        dataset_size=1,
        step_size=step_size,
        n_leapfrog=5,
        prior_std=1.0,
        target_accept_rate=target,
        step_size_adaptation_speed=speed,
    )
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(6), jnp.float32)}
    state = method.init(jax.random.key(0), params, {})
    state, metrics = jax.jit(method.update)(state, jax.random.key(1), None)

    expected = float(
        ref_hmc.adapt_step_size(
            jnp.float32(step_size), target,
            jnp.float32(metrics["accept_prob"]), speed,
        )
    )
    np.testing.assert_allclose(float(state.step_size), expected, rtol=1e-6)


def test_plane_basis_matches_reference(monkeypatch):
    """Posterior-surface plane construction parity: the LIVE vendored
    get_u_v_o (make_posterior_surface_plot.py:102-113, Gram-Schmidt basis
    through three checkpoints) vs our evals/surface.plane_basis. The
    vendored module parses argv at import, so feed it placeholder args."""
    monkeypatch.setattr(
        sys, "argv",
        ["plot", "--dir", "/tmp", "--checkpoint1", "a", "--checkpoint2", "b", "--checkpoint3", "c"],
    )
    # the module imports precision_utils whose jax.experimental.callback
    # API was removed from jax (SURVEY wart list); get_u_v_o doesn't use
    # it, so serve an inert stand-in
    import types as _types

    if "bnn_hmc.utils.precision_utils" not in sys.modules:
        stub = _types.ModuleType("bnn_hmc.utils.precision_utils")
        stub.rewrite_high_precision = lambda f: f
        sys.modules["bnn_hmc.utils.precision_utils"] = stub
    # same compat aliases the e2e SGD-parity test installs (the vendored
    # code predates jax 0.9; the reference logic is untouched)
    if "jax.config" not in sys.modules:
        _m = _types.ModuleType("jax.config")
        _m.config = jax.config
        sys.modules["jax.config"] = _m
    sys.modules.setdefault(
        "tensorflow_datasets", _types.ModuleType("tensorflow_datasets")
    )
    pytest.importorskip("matplotlib")
    pytest.importorskip("tqdm")
    import bnn_hmc.make_posterior_surface_plot as ref_plot

    from beyond_deep_ensembles_tpu import tree
    from beyond_deep_ensembles_tpu.evals.surface import plane_basis

    rng = np.random.RandomState(11)
    mk = lambda: {
        "a": jnp.asarray(rng.randn(4, 3), jnp.float32),
        "b": jnp.asarray(rng.randn(5), jnp.float32),
    }
    p0, p1, p2 = mk(), mk(), mk()

    ref_u, ref_unorm, ref_v, ref_vnorm, origin = ref_plot.get_u_v_o(p0, p1, p2)
    u, v, coords = plane_basis(p0, p1, p2)

    np.testing.assert_allclose(np.asarray(u), np.asarray(tree.ravel(ref_u)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(tree.ravel(ref_v)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(coords[1, 0]), float(ref_unorm), rtol=1e-6)
    np.testing.assert_allclose(float(coords[2, 1]), float(ref_vnorm), rtol=1e-5)
