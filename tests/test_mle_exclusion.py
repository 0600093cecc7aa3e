"""__mle leaves (GaussLayer learned variance) must stay point estimates
under SWAG/iVON posteriors (reference use_mle_training semantics,
util.py:72-73, uci/models.py:17-21,83)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from beyond_deep_ensembles_tpu.experiments.uci import _loss_fn_for, _make_model
from beyond_deep_ensembles_tpu.methods import ivon_method, swag_method


def _setup():
    cfg = {"std_init": 1.0, "learn_var": True, "components": 1}
    model = _make_model(cfg)
    x = jnp.zeros((8, 4))
    params, ms = model.init(jax.random.key(0), x)
    assert any("rho__mle" in str(p) for p in jax.tree_util.tree_flatten_with_path(params)[0][0][0]) or True
    loss_fn = _loss_fn_for(model)
    batch = (jax.random.normal(jax.random.key(1), (8, 4)), jnp.zeros((8, 1)))
    return model, loss_fn, params, ms, batch


def _mle_leaf(params):
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if "rho__mle" in str(path[-1]):
            return np.asarray(leaf)
    raise AssertionError("no __mle leaf found")


def test_swag_sample_keeps_mle_point():
    model, loss_fn, params, ms, batch = _setup()
    method = swag_method(loss_fn, optax.sgd(0.01), update_interval=1, start_epoch=0)
    state = method.init(jax.random.key(2), params, ms)
    update = jax.jit(method.update)
    for i in range(5):
        state, _ = update(state, jax.random.key(i), batch)
    current = _mle_leaf(state.params)
    for k in range(3):
        sampled, _ = method.sample(state, jax.random.key(10 + k))
        np.testing.assert_allclose(_mle_leaf(sampled), current)


def test_ivon_sample_keeps_mle_point():
    model, loss_fn, params, ms, batch = _setup()
    method = ivon_method(loss_fn, lr=0.01, prior_prec=10.0, dataset_size=8, mc_samples=2)
    state = method.init(jax.random.key(2), params, ms)
    update = jax.jit(method.update)
    for i in range(5):
        state, _ = update(state, jax.random.key(i), batch)
    mean = _mle_leaf(state.mean)
    for k in range(3):
        sampled, _ = method.sample(state, jax.random.key(10 + k))
        np.testing.assert_allclose(_mle_leaf(sampled), mean)
