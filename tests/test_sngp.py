"""SNGP head + spectral norm: precision accumulation, covariance
recompute/reset at epoch boundary, mean-field and MC prediction, and the
capped spectral norm bound."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from beyond_deep_ensembles_tpu.methods import LossOutput, predict, sngp_method
from beyond_deep_ensembles_tpu.nn.base import Model
from beyond_deep_ensembles_tpu.nn.sngp import SNGPHead
from beyond_deep_ensembles_tpu.nn.spectral_norm import SpectralNormDense


class TinySNGP(nn.Module):
    classes: int = 3
    sampling_mode: str = "mean field"

    @nn.compact
    def __call__(self, x, train: bool = True, n_samples: int = 1):
        h = SpectralNormDense(16, norm_bound=2.0)(x, train=train)
        h = nn.relu(h)
        return SNGPHead(
            outputs=self.classes,
            num_random_features=32,
            sampling_mode=self.sampling_mode,
        )(h, train=train, n_samples=n_samples)


def _data(n=64, d=8, classes=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, classes, size=n)
    return jnp.asarray(x), jnp.asarray(y)


def _setup(sampling_mode="mean field"):
    model = Model(TinySNGP(sampling_mode=sampling_mode))
    x, y = _data()
    params, model_state = model.init(jax.random.key(0), x)

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        out, kl, new_state = model.apply(params, model_state, key, xb, train=True)
        logp = jax.nn.log_softmax(out)
        loss = -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))
        return LossOutput(loss=loss, kl=kl, model_state=new_state)

    method = sngp_method(loss_fn, optax.adam(1e-2), ridge_penalty=0.001)
    state = method.init(jax.random.key(1), params, model_state)
    return model, method, state, (x, y)


def test_precision_accumulates_and_resets():
    model, method, state, batch = _setup()
    update = jax.jit(method.update)
    sngp0 = jax.tree.leaves(
        {k: v for k, v in state.model_state["sngp"].items()}
    )
    prec_before = np.asarray(state.model_state["sngp"]["SNGPHead_0"]["precision"])
    for i in range(3):
        state, metrics = update(state, jax.random.key(i), batch)
    prec_after = np.asarray(state.model_state["sngp"]["SNGPHead_0"]["precision"])
    assert not np.allclose(prec_before, prec_after)
    assert int(state.model_state["sngp"]["SNGPHead_0"]["seen_data"]) == 3 * 64

    state = method.finalize_epoch(state)
    sngp = state.model_state["sngp"]["SNGPHead_0"]
    # precision reset to ridge * I, covariance = inverse of accumulated
    np.testing.assert_allclose(
        np.asarray(sngp["precision"]), 0.001 * np.eye(32), atol=1e-6
    )
    ident = np.asarray(sngp["covariance"]) @ prec_after
    np.testing.assert_allclose(ident, np.eye(32), atol=1e-2)
    assert int(sngp["seen_data"]) == 0


def test_mean_field_prediction_changes_with_uncertainty():
    model, method, state, batch = _setup()
    update = jax.jit(method.update)
    for i in range(5):
        state, _ = update(state, jax.random.key(i), batch)
    state = method.finalize_epoch(state)
    x = batch[0][:4]

    def apply_fn(params, model_state, key, xx, n_samples=1):
        out, _, _ = model.apply(
            params, model_state, key, xx, train=False, n_samples=n_samples
        )
        return jax.nn.log_softmax(out, axis=-1)

    outs = predict(method, state, apply_fn, x, n_samples=5, key=jax.random.key(9))
    assert outs.shape == (5, 4, 3)
    # mean field: all samples identical
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[4]), rtol=1e-6)


def test_mc_mode_samples_differ():
    model, method, state, batch = _setup(sampling_mode="mc")
    update = jax.jit(method.update)
    for i in range(3):
        state, _ = update(state, jax.random.key(i), batch)
    state = method.finalize_epoch(state)

    def apply_fn(params, model_state, key, xx, n_samples=1):
        out, _, _ = model.apply(
            params, model_state, key, xx, train=False, n_samples=n_samples
        )
        return out

    outs = predict(method, state, apply_fn, batch[0][:4], n_samples=6, key=jax.random.key(9))
    assert outs.shape == (6, 4, 3)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[5]))


def test_spectral_norm_bound():
    """After training steps, the effective weight's top singular value
    must not exceed norm_bound (reference spectral_norm.py:123-130)."""
    model = Model(SpectralNormDense(8, norm_bound=1.5))
    x = jnp.asarray(np.random.RandomState(0).randn(16, 8).astype(np.float32))
    params, ms = model.init(jax.random.key(0), x)
    # inflate the kernel so the bound actually binds
    params = {**params, "kernel": params["kernel"] * 100.0}
    # run forwards to converge the power iteration
    for i in range(30):
        out, _, ms = model.apply(params, ms, jax.random.key(i), x, train=True)
    u = np.asarray(ms["spectral_norm"]["kernel_u"])
    w = np.asarray(params["kernel"]).T
    sigma = np.linalg.norm(w.T @ u)  # converged top singular value estimate
    scale = 1.0 / max(1.0, sigma / 1.5)
    effective_sigma = np.linalg.svd(np.asarray(params["kernel"]) * scale, compute_uv=False)[0]
    np.testing.assert_allclose(effective_sigma, 1.5, rtol=0.05)
    # a small kernel is left untouched (scale == 1)
    params_small = {**params, "kernel": params["kernel"] / 1e4}
    out_small, _, _ = model.apply(params_small, ms, jax.random.key(0), x, train=False)
    ref = x @ np.asarray(params_small["kernel"]) + np.asarray(params_small["bias"])
    np.testing.assert_allclose(np.asarray(out_small), ref, rtol=1e-3, atol=1e-6)


def test_cifar_build_freezes_beta():
    """Reference CIFAR quirk replicated: build_sngp hands SGD only the
    featurizer's parameters (cifar/models.py:98 ``SGD(model.parameters())``
    where ``model`` is the backbone), so the GP head's beta stays at init —
    unlike every other reference task, which optimizes ``sngp.parameters()``
    (amazon/models.py:158). ``sngp_train_beta: True`` opts out."""
    from beyond_deep_ensembles_tpu.experiments import cifar as our_cifar

    base = {
        **our_cifar.DEFAULT_CONFIG,
        "model": "sngp", "members": 1, "epochs": 1, "batch_size": 16,
        "lr": 0.05, "weight_decay": 0.0, "momentum": 0.9, "nesterov": True,
        "lr_schedule": False, "augment": False, "seed": 0, "dataset_size": 32,
        "sngp": {
            "num_random_features": 32, "num_gp_features": -1,
            "normalize_gp_features": False, "ridge_penalty": 1.0,
            "mean_field_factor": 20.0, "feature_scale": 1.0,
            "rff_init_std": 0.05,
        },
    }
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(16, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, 16))
    for train_beta in (False, True):
        built = our_cifar.build({**base, "sngp_train_beta": train_beta},
                                jax.random.key(0), 1)
        b0 = np.asarray(built.state.params["SNGPHead_0"]["beta"]["kernel"])
        state, _ = built.method.update(built.state, jax.random.key(1), (x, y))
        state, _ = built.method.update(state, jax.random.key(2), (x, y))
        moved = np.abs(
            np.asarray(state.params["SNGPHead_0"]["beta"]["kernel"]) - b0
        ).max()
        backbone_moved = np.abs(
            np.asarray(state.params["SpectralNormConv_0"]["kernel"])
            - np.asarray(built.state.params["SpectralNormConv_0"]["kernel"])
        ).max()
        assert backbone_moved > 0.0
        assert (moved > 0.0) == train_beta, (train_beta, moved)
