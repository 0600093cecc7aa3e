"""KFAC (kron) Laplace: exactness on a linear-head regression model and
the ll_svgd last-layer variant."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from beyond_deep_ensembles_tpu.methods import (
    LossOutput,
    laplace_method,
    last_layer_method,
    map_method,
    svgd_method,
)
from beyond_deep_ensembles_tpu.nn.base import Model


class LinearHead(nn.Module):
    out: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.relu(nn.Dense(8, name="backbone")(x))
        return nn.Dense(self.out)(h)


def _fit(hessian, out=1):
    model = Model(LinearHead(out=out))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(128, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(128, out).astype(np.float32))
    params, ms = model.init(jax.random.key(0), x)

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        pred, kl, new_ms = model.apply(params, model_state, key, xb, train=True)
        return LossOutput(loss=jnp.mean((pred - yb) ** 2), kl=kl, model_state=new_ms)

    inner = map_method(loss_fn, optax.adam(0.01))
    state = inner.init(jax.random.key(1), params, ms)
    lap = laplace_method(model, hessian=hessian, regression=True, inner=inner,
                         mean_output=lambda p, s, xx: model.apply(
                             p, s, None, xx, train=False, mutable_state=False)[0])
    return lap, lap.fit(state, (x, y)), (x, y)


def test_kron_matches_full_on_linear_head():
    """For a linear head the Kronecker factorization is EXACT in
    regression: per-parameter posterior stds from kron and full sampling
    must agree."""
    lap_full, st_full, _ = _fit("full")
    lap_kron, st_kron, _ = _fit("kron")
    assert st_kron.kron_ua.shape == (9, 9)  # 8 features + bias row
    # matched prior precision sweep on identical data
    keys = jax.random.split(jax.random.key(2), 400)

    def draws(lap, st):
        def one(k):
            p, _ = lap.sample(st, k)
            return jnp.concatenate(
                [l.reshape(-1) for l in jax.tree.leaves(p)]
            )
        # float64: np.std of hundreds of identical fp32 values is ~1e-6
        # of accumulation noise, which breaks the constant-coordinate check
        return np.asarray(jax.vmap(one)(keys)).astype(np.float64)

    d_full = draws(lap_full, st_full)
    d_kron = draws(lap_kron, st_kron)
    # compare only the varying coordinates (the head)
    vf, vk = d_full.std(0), d_kron.std(0)
    moving = vf > 1e-6
    assert moving.sum() == 9  # kernel (8) + bias (1)
    # same coordinates move...
    np.testing.assert_array_equal(moving, vk > 1e-6)
    # ...with matching stds when priors agree (both swept on same marglik)
    if float(st_full.prior_prec) == float(st_kron.prior_prec):
        np.testing.assert_allclose(vf[moving], vk[moving], rtol=0.25)


def test_kron_classification_runs():
    lap, st, (x, y) = _fit("kron", out=3)
    p, _ = lap.sample(st, jax.random.key(3))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(p))


def test_ll_svgd_particles():
    model = Model(LinearHead())
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 4).astype(np.float32))
    w = rng.randn(4, 1).astype(np.float32)
    y = jnp.asarray(np.asarray(x) @ w)
    params, ms = model.init(jax.random.key(0), x)

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        pred, kl, new_ms = model.apply(params, model_state, key, xb, train=True)
        return LossOutput(loss=jnp.mean((pred - yb) ** 2), kl=kl, model_state=new_ms)

    n_particles = 3
    method = last_layer_method(
        loss_fn,
        lambda lf: svgd_method(
            lf, optax.adam(0.01), particle_count=n_particles, dataset_size=64,
            use_pallas=False,
        ),
        backbone_tx=optax.adam(0.01),
        head_particles=n_particles,
    )
    state = method.init(jax.random.key(1), params, ms)
    # head is stacked with a particle axis
    assert state.inner.params["Dense_0"]["kernel"].shape[0] == n_particles
    update = jax.jit(method.update)
    for i in range(40):
        state, metrics = update(state, jax.random.key(i), (x, y))
    assert float(metrics["loss"]) < 1.5
    # sampling cycles particles; backbone shared
    p0, _ = method.sample(state, jax.random.key(9), 0)
    p1, _ = method.sample(state, jax.random.key(9), 1)
    np.testing.assert_allclose(
        p0["backbone"]["kernel"], p1["backbone"]["kernel"]
    )
    assert not np.allclose(p0["Dense_0"]["kernel"], p1["Dense_0"]["kernel"])