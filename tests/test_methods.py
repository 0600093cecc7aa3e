"""Method-level unit tests against closed-form / small-N references
(the test strategy SURVEY.md §4 calls for: Gaussian KL, SWAG moments,
SVGD phi on 2 particles, iVON on quadratics)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from beyond_deep_ensembles_tpu.methods import (
    GaussianPrior,
    LossOutput,
    bbb_method,
    deep_ensemble,
    ivon_method,
    map_method,
    predict,
    svgd_method,
    swag_method,
)
from beyond_deep_ensembles_tpu.methods.svgd import rbf
from beyond_deep_ensembles_tpu.tree import ravel, tree_stack


# --- shared toy problem: linear regression --------------------------------

W_TRUE = jnp.asarray([[1.5], [-2.0], [0.5]])


def _data(key, n=256):
    x = jax.random.normal(key, (n, 3))
    y = x @ W_TRUE + 0.05 * jax.random.normal(jax.random.key(99), (n, 1))
    return x, y


def _linear_loss(params, model_state, key, batch):
    del key
    x, y = batch
    pred = x @ params["w"]
    return LossOutput(loss=jnp.mean((pred - y) ** 2), model_state=model_state)


def _init_params(key):
    return {"w": 0.1 * jax.random.normal(key, (3, 1))}


def test_map_converges():
    batch = _data(jax.random.key(0))
    method = map_method(_linear_loss, optax.adam(0.05))
    state = method.init(jax.random.key(1), _init_params(jax.random.key(2)), {})
    step = jax.jit(method.update)
    for i in range(300):
        state, metrics = step(state, jax.random.key(i), batch)
    np.testing.assert_allclose(state.params["w"], W_TRUE, atol=0.05)
    p, _ = method.sample(state, jax.random.key(0))
    np.testing.assert_allclose(p["w"], state.params["w"])


def test_bbb_kl_weighting_and_convergence():
    batch = _data(jax.random.key(0))
    prior = GaussianPrior(0.0, 1.0)

    def loss_fn(params, model_state, key, batch):
        x, y = batch
        w = params["w__gmean"] + jax.nn.softplus(params["w__grho"]) * jax.random.normal(
            key, params["w__gmean"].shape
        )
        return LossOutput(loss=jnp.mean((x @ w - y) ** 2), model_state=model_state)

    params = {
        "w__gmean": 0.1 * jax.random.normal(jax.random.key(2), (3, 1)),
        "w__grho": jnp.full((3, 1), -3.0),
    }
    method = bbb_method(
        loss_fn, optax.adam(0.05), prior, dataset_size=256, mc_samples=3
    )
    state = method.init(jax.random.key(1), params, {})
    step = jax.jit(method.update)
    for i in range(400):
        state, metrics = step(state, jax.random.key(i), batch)
    assert np.isfinite(metrics["loss"])
    assert metrics["kl"] > 0
    np.testing.assert_allclose(state.params["w__gmean"], W_TRUE, atol=0.15)
    # posterior std should shrink below the softplus(-3) ~ 0.049 init
    assert float(jax.nn.softplus(state.params["w__grho"]).mean()) < 0.049


def test_bbb_nan_guard():
    def nan_loss(params, model_state, key, batch):
        return LossOutput(loss=jnp.float32(jnp.nan), model_state=model_state)

    params = {"w__gmean": jnp.ones((2,)), "w__grho": jnp.full((2,), -3.0)}
    method = bbb_method(nan_loss, optax.sgd(0.1), GaussianPrior(), dataset_size=10)
    state = method.init(jax.random.key(0), params, {})
    new_state, _ = jax.jit(method.update)(state, jax.random.key(1), None)
    np.testing.assert_allclose(new_state.params["w__gmean"], params["w__gmean"])


def test_swag_moments_match_naive():
    """SWAG running mean/sq/deviations == naive recomputation over the
    collected iterates (reference swag.py:91-105 semantics: first update
    averages the INIT params with the first post-step params)."""
    batch = _data(jax.random.key(0))
    K = 4
    method = swag_method(
        _linear_loss, optax.sgd(0.05), update_interval=1, start_epoch=0, deviation_samples=K
    )
    params0 = _init_params(jax.random.key(2))
    state = method.init(jax.random.key(1), params0, {})
    step = jax.jit(method.update)

    collected = [np.asarray(ravel(params0))]  # updates=0 state holds init
    means, sqs, devs = [], [], []
    for i in range(6):
        state, _ = step(state, jax.random.key(i), batch)
        collected.append(np.asarray(ravel(state.params)))
        # naive running stats with the reference recurrence: the counter
        # pre-increments (swag.py:98-101), so update k uses weight k on
        # the previous mean — the init point counts as one sample.
        n = i + 1
        mean_prev = means[-1] if means else collected[0]
        sq_prev = sqs[-1] if sqs else collected[0] ** 2
        means.append((n * mean_prev + collected[-1]) / (n + 1))
        sqs.append((n * sq_prev + collected[-1] ** 2) / (n + 1))
    np.testing.assert_allclose(np.asarray(state.mean), means[-1], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.sq_mean), sqs[-1], rtol=1e-5)
    # ring buffer holds the last K deviations (vs the mean at update time)
    assert int(state.updates) == 6
    last_dev = collected[-1] - means[-1]
    np.testing.assert_allclose(np.asarray(state.deviations[-1]), last_dev, atol=1e-6)

    # sampling: with updates the draw differs from the mean but stays close
    p, _ = method.sample(state, jax.random.key(7))
    assert p["w"].shape == (3, 1)
    assert not np.allclose(p["w"], np.asarray(state.mean).reshape(3, 1))


def test_swag_start_epoch_gates_updates():
    method = swag_method(
        _linear_loss, optax.sgd(0.01), update_interval=1, start_epoch=2, deviation_samples=3
    )
    state = method.init(jax.random.key(0), _init_params(jax.random.key(1)), {})
    batch = _data(jax.random.key(2), n=32)
    step = jax.jit(method.update)
    state, _ = step(state, jax.random.key(3), batch)
    assert int(state.updates) == 0  # epoch 0 < start_epoch
    state = method.finalize_epoch(state)
    state = method.finalize_epoch(state)
    state, _ = step(state, jax.random.key(4), batch)
    assert int(state.updates) == 1


def test_rbf_matches_reference_formula():
    """rbf kernel + grad vs a numpy transcription of svgd.py:14-32."""
    rng = np.random.RandomState(0)
    particles = rng.randn(5, 7).astype(np.float32)
    k, gk = rbf(jnp.asarray(particles))

    d2 = ((particles[:, None, :] - particles[None, :, :]) ** 2).sum(-1)
    med = np.quantile(d2, 0.5)  # linear interpolation (torch default)
    h = np.sqrt(0.5 * med / np.log(5 + 1)) + 1e-8
    kernel = np.exp(-d2 / (2 * h**2))
    grad_kernel = (kernel.sum(1)[:, None] * particles - kernel @ particles) / h**2
    np.testing.assert_allclose(np.asarray(k), kernel, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), grad_kernel, rtol=1e-3, atol=1e-5)


def test_svgd_particles_spread_and_converge():
    batch = _data(jax.random.key(0))
    n_particles = 6
    method = svgd_method(
        _linear_loss,
        optax.adam(0.05),
        particle_count=n_particles,
        dataset_size=256,
        l2_reg=0.0,
        use_pallas=False,
    )
    stacked = tree_stack(
        [_init_params(jax.random.key(10 + i)) for i in range(n_particles)]
    )
    state = method.init(jax.random.key(1), stacked, {})
    step = jax.jit(method.update)
    for i in range(300):
        state, metrics = step(state, jax.random.key(i), batch)
    # every particle near the optimum, but repulsion keeps them distinct
    np.testing.assert_allclose(
        state.params["w"], jnp.broadcast_to(W_TRUE, (n_particles, 3, 1)), atol=0.2
    )
    flat = np.asarray(jax.vmap(ravel)(state.params))
    assert np.std(flat, axis=0).max() > 1e-4
    # sample cycles particles by index
    p0, _ = method.sample(state, jax.random.key(0), 0)
    p1, _ = method.sample(state, jax.random.key(0), 1)
    np.testing.assert_allclose(p0["w"], state.params["w"][0])
    np.testing.assert_allclose(p1["w"], state.params["w"][1])


def test_svgd_per_particle_model_state():
    """A model carrying real batch stats trained per-particle: each
    particle's statistics must track ITS OWN forward passes, and sample()
    must return the matching slice (VERDICT r2 weak #5 — the old code
    kept particle 0's state for everyone via pytree truthiness)."""
    import flax.linen as nn

    from beyond_deep_ensembles_tpu.nn.base import Model

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            h = nn.Dense(8)(x)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.5)(h)
            return nn.Dense(1)(h)

    model = Model(BNNet())
    n_particles = 3
    x = jax.random.normal(jax.random.key(0), (32, 3))
    y = x @ W_TRUE

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        out, kl, new_ms = model.apply(params, model_state, key, xb, train=True)
        return LossOutput(loss=jnp.mean((out - yb) ** 2), kl=kl, model_state=new_ms)

    inits = [model.init(jax.random.key(10 + i), x) for i in range(n_particles)]
    stacked_params = tree_stack([p for p, _ in inits])
    method = svgd_method(
        loss_fn,
        optax.adam(0.05),
        particle_count=n_particles,
        dataset_size=32,
        use_pallas=False,
    )
    # unstacked model state from a single init is broadcast to particles
    state = method.init(jax.random.key(1), stacked_params, inits[0][1])
    means0 = state.model_state["batch_stats"]["BatchNorm_0"]["mean"]
    assert means0.shape[0] == n_particles
    step = jax.jit(method.update)
    for i in range(10):
        state, _ = step(state, jax.random.key(i), (x, y))
    means = np.asarray(state.model_state["batch_stats"]["BatchNorm_0"]["mean"])
    assert means.shape[0] == n_particles
    # particles have different params -> different pre-BN activations ->
    # different running means
    assert np.std(means, axis=0).max() > 1e-6
    # sample returns the particle's own state slice, usable for eval
    for idx in range(n_particles):
        p, ms = method.sample(state, jax.random.key(0), idx)
        np.testing.assert_allclose(
            ms["batch_stats"]["BatchNorm_0"]["mean"], means[idx]
        )
        out, _, _ = model.apply(p, ms, None, x, train=False)
        assert np.isfinite(np.asarray(out)).all()


def test_ivon_quadratic():
    """On 0.5*h*(w-a)^2 the iVON mean must converge to a and the precision
    should grow toward the curvature scale."""
    h = jnp.asarray([2.0, 0.5])
    a = jnp.asarray([1.0, -3.0])

    def loss_fn(params, model_state, key, batch):
        del key, batch
        return LossOutput(
            loss=jnp.sum(0.5 * h * (params["w"] - a) ** 2), model_state=model_state
        )

    method = ivon_method(
        loss_fn,
        lr=0.1,
        prior_prec=1.0,
        dataset_size=100,
        mc_samples=3,
    )
    state = method.init(jax.random.key(0), {"w": jnp.zeros(2)}, {})
    step = jax.jit(method.update)
    for i in range(800):
        state, metrics = step(state, jax.random.key(i), None)
    np.testing.assert_allclose(np.asarray(state.mean["w"]), np.asarray(a), atol=0.25)
    samp, _ = method.sample(state, jax.random.key(1))
    assert samp["w"].shape == (2,)
    assert not np.allclose(samp["w"], state.mean["w"])


def test_deep_ensemble_and_predict():
    batch = _data(jax.random.key(0))
    inner = map_method(_linear_loss, optax.adam(0.05))
    method = deep_ensemble(inner, n_members=3)
    stacked = tree_stack([_init_params(jax.random.key(20 + i)) for i in range(3)])
    state = method.init(jax.random.key(1), stacked, {})
    step = jax.jit(method.update)
    for i in range(200):
        state, metrics = step(state, jax.random.key(i), batch)
    np.testing.assert_allclose(
        state.params["w"], jnp.broadcast_to(W_TRUE, (3, 3, 1)), atol=0.05
    )
    # member cycling
    p0, _ = method.sample(state, jax.random.key(0), 0)
    p1, _ = method.sample(state, jax.random.key(0), 1)
    p3, _ = method.sample(state, jax.random.key(0), 3)
    np.testing.assert_allclose(p0["w"], state.params["w"][0])
    np.testing.assert_allclose(p1["w"], state.params["w"][1])
    np.testing.assert_allclose(p3["w"], state.params["w"][0])

    x = batch[0][:5]
    outs = predict(
        method,
        state,
        lambda params, ms, key, xx: xx @ params["w"],
        x,
        n_samples=6,
        key=jax.random.key(5),
    )
    assert outs.shape == (6, 5, 1)
    np.testing.assert_allclose(outs.mean(0), x @ W_TRUE, atol=0.1)


def test_multiswag_ensemble():
    """MultiSWAG: deep ensemble wrapping SWAG — member cycling selects
    each member's own low-rank posterior (reference MultiSWAG variant,
    cifar.yaml + ensemble.py)."""
    batch = _data(jax.random.key(0), n=64)
    inner = swag_method(
        _linear_loss, optax.sgd(0.05), update_interval=1, start_epoch=0,
        deviation_samples=4,
    )
    method = deep_ensemble(inner, n_members=2)
    stacked = tree_stack([_init_params(jax.random.key(30 + i)) for i in range(2)])
    state = method.init(jax.random.key(1), stacked, {})
    step = jax.jit(method.update)
    for i in range(10):
        state, metrics = step(state, jax.random.key(i), batch)
    state = method.finalize_epoch(state)
    assert int(state.epoch[0]) == 1 and int(state.updates[0]) == 10
    # sampling: index selects member, key draws from that member's posterior
    p0, _ = method.sample(state, jax.random.key(5), 0)
    p1, _ = method.sample(state, jax.random.key(5), 1)
    p0b, _ = method.sample(state, jax.random.key(6), 0)
    assert p0["w"].shape == (3, 1)
    assert not np.allclose(p0["w"], p1["w"])  # different members
    assert not np.allclose(p0["w"], p0b["w"])  # different draws
    # predictive pipeline end-to-end
    outs = predict(
        method, state, lambda p, ms, k, xx: xx @ p["w"], batch[0][:4],
        n_samples=4, key=jax.random.key(7),
    )
    assert outs.shape == (4, 4, 1)
    assert np.all(np.isfinite(np.asarray(outs)))
