"""HMC / SGLD / MFVI sanity on a closed-form Gaussian target — the same
correctness oracle the reference used in its mcmc_gaussian_test notebook
(SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from beyond_deep_ensembles_tpu.methods import (
    LossOutput,
    hmc_method,
    mfvi_method,
    sgmcmc_method,
)

import optax

# Target: posterior N(mu*, sigma*^2) per-dim induced by
# U = dataset_size * loss + ||θ||²/2 with dataset_size = 1 in all tests.
MU = jnp.asarray([1.0, -0.5])
PREC_LIK = 4.0  # likelihood precision


def quad_loss(params, model_state, key, batch):
    del key, batch
    loss = 0.5 * PREC_LIK * jnp.sum((params["w"] - MU) ** 2)
    return LossOutput(loss=loss, model_state=model_state)


# posterior precision = PREC_LIK + 1 (prior_std=1, dataset_size=1)
POST_PREC = PREC_LIK + 1.0
POST_MU = PREC_LIK * MU / POST_PREC
POST_STD = POST_PREC**-0.5


def _collect_samples(method, state, n_iters, keys_seed=0, thin=1):
    update = jax.jit(method.update)
    draws = []
    for i in range(n_iters):
        state, metrics = update(state, jax.random.fold_in(jax.random.key(keys_seed), i), None)
        if i % thin == 0:
            draws.append(np.asarray(state.params["w"]))
    return state, np.stack(draws), metrics


def test_hmc_gaussian_moments():
    method = hmc_method(
        quad_loss,
        dataset_size=1,
        step_size=0.05,
        n_leapfrog=20,
        prior_std=1.0,
        step_size_adaptation_speed=0.0,
        max_samples=50,
    )
    state = method.init(jax.random.key(0), {"w": jnp.zeros(2)}, {})
    update = jax.jit(method.update)
    draws = []
    accepts = []
    for i in range(400):
        state, metrics = update(state, jax.random.fold_in(jax.random.key(1), i), None)
        accepts.append(float(metrics["accepted"]))
        if i >= 100:
            draws.append(np.asarray(state.params["w"]))
    draws = np.stack(draws)
    assert np.mean(accepts) > 0.5
    np.testing.assert_allclose(draws.mean(0), np.asarray(POST_MU), atol=0.12)
    np.testing.assert_allclose(draws.std(0), POST_STD, rtol=0.4)
    # sample() returns ring-buffer entries
    p, _ = method.sample(state, jax.random.key(2), 0)
    assert p["w"].shape == (2,)


def test_sgld_gaussian_moments():
    method = sgmcmc_method(
        quad_loss,
        dataset_size=1,
        step_size_fn=2e-3,
        momentum_decay=0.9,
        prior_std=1.0,
        sample_interval=5,
        max_samples=100,
        burn_in_steps=500,
    )
    state = method.init(jax.random.key(0), {"w": jnp.zeros(2)}, {})
    update = jax.jit(method.update)
    draws = []
    for i in range(2500):
        state, _ = update(state, jax.random.fold_in(jax.random.key(1), i), None)
        if i >= 500:
            draws.append(np.asarray(state.params["w"]))
    draws = np.stack(draws)
    np.testing.assert_allclose(draws.mean(0), np.asarray(POST_MU), atol=0.12)
    # SGMCMC std should be within a factor ~2 of the true posterior std
    assert 0.3 * POST_STD < draws.std(0).mean() < 3 * POST_STD
    assert int(state.n_samples) == 100


def test_mfvi_gaussian():
    # Adam with decaying LR: at the ELBO optimum the reparameterized
    # gradient is noise-dominated and constant-LR Adam wobbles O(lr).
    method = mfvi_method(
        quad_loss,
        optax.adam(optax.cosine_decay_schedule(0.05, 2000)),
        dataset_size=1,
        prior_std=1.0,
        sigma_init=0.05,
        mc_samples=2,
    )
    state = method.init(jax.random.key(0), {"w": jnp.zeros(2)}, {})
    update = jax.jit(method.update)
    for i in range(2000):
        state, metrics = update(state, jax.random.fold_in(jax.random.key(1), i), None)
    np.testing.assert_allclose(np.asarray(state.mean["w"]), np.asarray(POST_MU), atol=0.06)
    learned_std = np.asarray(jax.nn.softplus(state.rho["w"]))
    np.testing.assert_allclose(learned_std, POST_STD, rtol=0.5)
    # posterior samples vary
    p1, _ = method.sample(state, jax.random.key(2))
    p2, _ = method.sample(state, jax.random.key(3))
    assert not np.allclose(p1["w"], p2["w"])
