"""Last-layer composition, DenseNet, checkpoint save/restore."""
import os
import tempfile

import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from beyond_deep_ensembles_tpu.methods import (
    GaussianPrior,
    LossOutput,
    bbb_method,
    ivon_method,
    last_layer_method,
    map_method,
    predict,
    svgd_method,
    swag_method,
)
from beyond_deep_ensembles_tpu.methods.last_layer import merge_params, split_params
from beyond_deep_ensembles_tpu.methods.laplace import last_layer_mask
from beyond_deep_ensembles_tpu.models.densenet import DenseNetClassifier
from beyond_deep_ensembles_tpu.nn.base import Model
from beyond_deep_ensembles_tpu.utils import checkpoint as ckpt


class TwoLayer(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.relu(nn.Dense(16)(x))
        return nn.Dense(1)(h)


def _setup_ll(inner_factory):
    model = Model(TwoLayer())
    x = jnp.asarray(np.random.RandomState(0).randn(64, 4).astype(np.float32))
    w = np.random.RandomState(1).randn(4, 1).astype(np.float32)
    y = jnp.asarray(np.asarray(x) @ w)
    params, ms = model.init(jax.random.key(0), x)

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        out, kl, new_ms = model.apply(params, model_state, key, xb, train=True)
        return LossOutput(loss=jnp.mean((out - yb) ** 2), kl=kl, model_state=new_ms)

    method = last_layer_method(loss_fn, inner_factory, optax.adam(0.01))
    state = method.init(jax.random.key(1), params, ms)
    return model, method, state, (x, y), params


def test_split_merge_roundtrip():
    params = {"Dense_0": {"kernel": jnp.ones((4, 16))}, "Dense_1": {"kernel": jnp.ones((16, 1))}}
    mask = last_layer_mask(params)
    assert jax.tree.leaves(mask) == [False, True]
    b, h = split_params(params, mask)
    assert b["Dense_1"]["kernel"].size == 0
    assert h["Dense_0"]["kernel"].size == 0
    merged = merge_params(b, h)
    np.testing.assert_allclose(merged["Dense_0"]["kernel"], params["Dense_0"]["kernel"])
    np.testing.assert_allclose(merged["Dense_1"]["kernel"], params["Dense_1"]["kernel"])


def test_last_layer_swag_trains_both_parts():
    model, method, state, batch, params0 = _setup_ll(
        lambda lf: swag_method(lf, optax.adam(0.01), update_interval=1, start_epoch=0)
    )
    update = jax.jit(method.update)
    for i in range(30):
        state, metrics = update(state, jax.random.key(i), batch)
    # both backbone and head moved
    assert not np.allclose(
        state.backbone["Dense_0"]["kernel"], params0["Dense_0"]["kernel"]
    )
    assert not np.allclose(
        state.inner.params["Dense_1"]["kernel"], params0["Dense_1"]["kernel"]
    )
    assert float(metrics["loss"]) < 3.0
    # SWAG posterior sampling draws only over the head
    p1, _ = method.sample(state, jax.random.key(99))
    p2, _ = method.sample(state, jax.random.key(100))
    np.testing.assert_allclose(
        p1["Dense_0"]["kernel"], p2["Dense_0"]["kernel"]
    )  # backbone deterministic
    assert not np.allclose(p1["Dense_1"]["kernel"], p2["Dense_1"]["kernel"])


def test_last_layer_backbone_grads_nonzero_per_inner():
    """Every inner method the reference composes with last-layer
    training (iwildcam models.py:87-154: swag_ll, ll_ivon, ll_svgd) must
    produce a NON-ZERO backbone gradient through metrics['loss'] — the
    PosteriorMethod contract (methods/api.py): the reported loss is the
    differentiable pre-update minibatch loss. A detached or post-update
    loss would silently freeze the backbone (ADVICE r2)."""
    cases = {
        "swag": (
            lambda lf: swag_method(lf, optax.adam(0.01), update_interval=1, start_epoch=0),
            0,
        ),
        "ivon": (
            lambda lf: ivon_method(lf, lr=0.05, prior_prec=1.0, dataset_size=64, mc_samples=2),
            0,
        ),
        "svgd": (
            lambda lf: svgd_method(lf, optax.adam(0.01), particle_count=3, dataset_size=64, l2_reg=1e-4),
            3,
        ),
    }
    for name, (factory, particles) in cases.items():
        model = Model(TwoLayer())
        x = jnp.asarray(np.random.RandomState(0).randn(64, 4).astype(np.float32))
        w = np.random.RandomState(1).randn(4, 1).astype(np.float32)
        y = jnp.asarray(np.asarray(x) @ w)
        params, ms = model.init(jax.random.key(0), x)

        def loss_fn(params, model_state, key, batch):
            xb, yb = batch
            out, kl, new_ms = model.apply(params, model_state, key, xb, train=True)
            return LossOutput(loss=jnp.mean((out - yb) ** 2), kl=kl, model_state=new_ms)

        method = last_layer_method(
            loss_fn, factory, optax.sgd(0.05), head_particles=particles
        )
        state = method.init(jax.random.key(1), params, ms)
        update = jax.jit(method.update)
        state, _ = update(state, jax.random.key(2), (x, y))
        moved = float(
            np.max(
                np.abs(
                    np.asarray(state.backbone["Dense_0"]["kernel"])
                    - np.asarray(params["Dense_0"]["kernel"])
                )
            )
        )
        assert moved > 1e-7, f"{name}: backbone did not move after one step"


def test_last_layer_bbb_runs():
    # BBB inner over a plain head: the head has no gaussian leaves, so KL
    # is zero — the composition still has to train (l2 path).
    model, method, state, batch, _ = _setup_ll(
        lambda lf: bbb_method(lf, optax.adam(0.01), GaussianPrior(), dataset_size=64)
    )
    update = jax.jit(method.update)
    loss0 = None
    for i in range(30):
        state, metrics = update(state, jax.random.key(i), batch)
        loss0 = loss0 or float(metrics["loss"])
    assert float(metrics["loss"]) < loss0


def test_densenet_shapes_and_variants():
    x = jnp.zeros((2, 32, 32, 3))
    for kind in ["plain", "bbb"]:
        model = Model(
            DenseNetClassifier(
                classes=2,
                growth_rate=4,
                block_config=(2, 2),
                init_features=8,
                bn_size=2,
                conv_kind=kind,
                head_kind=kind,
            )
        )
        params, ms = model.init(jax.random.key(0), x)
        out, kl, _ = model.apply(params, ms, jax.random.key(1), x, train=True)
        assert out.shape == (2, 2)
        assert np.all(np.isfinite(np.asarray(out)))


def test_checkpoint_roundtrip():
    model = Model(TwoLayer())
    x = jnp.zeros((4, 4))
    params, ms = model.init(jax.random.key(0), x)

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        out, kl, new_ms = model.apply(params, model_state, key, xb, train=True)
        return LossOutput(loss=jnp.mean((out - yb) ** 2), kl=kl, model_state=new_ms)

    method = map_method(loss_fn, optax.adam(0.01))
    state = method.init(jax.random.key(1), params, ms)
    batch = (x, jnp.zeros((4, 1)))
    state, _ = jax.jit(method.update)(state, jax.random.key(2), batch)

    with tempfile.TemporaryDirectory() as d:
        run = os.path.join(d, "run")
        ckpt.save_checkpoint(run, 1, state)
        ckpt.save_checkpoint(run, 5, state.replace(step=jnp.int32(5)))
        assert ckpt.latest_checkpoint_step(run) == 5
        restored, step = ckpt.restore_checkpoint(run, state)
        assert step == 5
        assert int(restored.step) == 5
        np.testing.assert_allclose(
            np.asarray(restored.params["Dense_0"]["kernel"]),
            np.asarray(state.params["Dense_0"]["kernel"]),
        )
        # final artifact
        ckpt.save_final(run, "map", state)
        final = ckpt.restore_final(run, "map", state)
        assert int(final.step) == 1
        # fresh dir: nothing to resume
        _, none_step = ckpt.restore_checkpoint(os.path.join(d, "empty"), state)
        assert none_step is None

def test_async_checkpoint_roundtrip():
    """async_save=True overlaps the orbax write with subsequent compute
    (utils/checkpoint._AsyncSaver — measured x29 epoch overhead for a
    blocking DistilBERT save, benchmarks/sustained_big.py). The restore
    surface (latest_checkpoint_step / restore_checkpoint / save_final)
    must barrier on in-flight writes, so an async save immediately
    followed by a restore is never partial."""
    model = Model(TwoLayer())
    x = jnp.zeros((4, 4))
    params, ms = model.init(jax.random.key(0), x)

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        out, kl, new_ms = model.apply(params, model_state, key, xb, train=True)
        return LossOutput(loss=jnp.mean((out - yb) ** 2), kl=kl, model_state=new_ms)

    method = map_method(loss_fn, optax.adam(0.01))
    state = method.init(jax.random.key(1), params, ms)

    with tempfile.TemporaryDirectory() as d:
        run = os.path.join(d, "run")
        ckpt.save_checkpoint(run, 1, state, async_save=True)
        ckpt.save_checkpoint(
            run, 3, state.replace(step=jnp.int32(3)), async_save=True
        )
        # latest_checkpoint_step barriers on the in-flight write
        assert ckpt.latest_checkpoint_step(run) == 3
        restored, step = ckpt.restore_checkpoint(run, state)
        assert step == 3 and int(restored.step) == 3
        np.testing.assert_allclose(
            np.asarray(restored.params["Dense_0"]["kernel"]),
            np.asarray(state.params["Dense_0"]["kernel"]),
        )
        ckpt.wait_for_async_saves()  # idempotent with nothing in flight

        # a failing async write surfaces on the next barrier, not silently
        class Unserializable:
            pass

        ckpt.save_checkpoint(run, 7, {"bad": Unserializable()}, async_save=True)
        with pytest.raises(Exception):
            ckpt.wait_for_async_saves()
