"""Auxiliary components: schedules, losses, text packing, tiramisu,
plotting tables, torch checkpoint conversion, parallel trainer."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from beyond_deep_ensembles_tpu.evals.losses import (
    gaussian_log_prior,
    gaussian_log_prior_diff,
    heteroscedastic_gaussian_ll,
    tempered_softmax_xent,
)
from beyond_deep_ensembles_tpu.utils.schedules import (
    constant_with_cosine_burnin,
    cosine_with_warmup,
    cyclical_cosine,
    step_schedule,
    wilson_schedule,
)


def test_wilson_schedule_shape():
    f = wilson_schedule(100, 0.05, swag_lr=0.0005)
    np.testing.assert_allclose(float(f(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(f(95)), 0.0005 / 0.05, rtol=1e-5)
    mid = float(f(70))
    assert 0.01 < mid < 1.0
    # trace-safe
    assert jax.jit(f)(jnp.int32(70)).shape == ()


def test_step_schedule():
    f = step_schedule([10, 20], 0.1)
    np.testing.assert_allclose(float(f(5)), 1.0)
    np.testing.assert_allclose(float(f(15)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(f(25)), 0.01, rtol=1e-6)


def test_cosine_warmup_and_cyclical():
    f = cosine_with_warmup(1.0, 10, 110)
    np.testing.assert_allclose(float(f(5)), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(f(10)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(f(110)), 0.0, atol=1e-6)

    g = cyclical_cosine(1.0, cycle_steps=50, burnin_steps=10)
    np.testing.assert_allclose(float(g(5)), 1.0)
    np.testing.assert_allclose(float(g(10)), 1.0)  # cycle start
    # half cycle sits at burnin + 1 + cycle/2 (the reference's -1 phase
    # offset, optim_utils.py:64)
    np.testing.assert_allclose(float(g(36)), 0.5, atol=1e-5)

    h = constant_with_cosine_burnin(1.0, 0.1, 100)
    np.testing.assert_allclose(float(h(0)), 1.0)
    np.testing.assert_allclose(float(h(100)), 0.1, rtol=1e-5)


def test_losses():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.asarray([0, 1])
    l1 = tempered_softmax_xent(logits, labels, 1.0)
    l2 = tempered_softmax_xent(logits, labels, 2.0)
    np.testing.assert_allclose(float(l1), 2 * float(l2), rtol=1e-6)

    params = {"w": jnp.ones((4,))}
    lp = gaussian_log_prior(params, 1.0)
    ref = -0.5 * 4 - 2 * np.log(2 * np.pi)
    np.testing.assert_allclose(float(lp), ref, rtol=1e-5)
    diff = gaussian_log_prior_diff(params, {"w": jnp.zeros((4,))})
    np.testing.assert_allclose(float(diff), -2.0, rtol=1e-6)

    outs = jnp.asarray([[0.0, 0.5413]])  # softplus(0.5413) ~ 1.0
    ll = heteroscedastic_gaussian_ll(outs, jnp.asarray([0.0]))
    assert np.isfinite(float(ll[0]))


def test_text_packing():
    from beyond_deep_ensembles_tpu.data.text import HashTokenizer, pack_text

    packed = pack_text(["hello world", "bye"], max_length=8, tokenizer=HashTokenizer())
    assert packed.shape == (2, 8, 2)
    assert packed[0, 0, 0] == 101  # CLS
    assert packed[1, :, 1].sum() == 3  # CLS + 1 word + SEP


@pytest.mark.slow
def test_tiramisu_shapes():
    from beyond_deep_ensembles_tpu.models.tiramisu import MidasTiramisu
    from beyond_deep_ensembles_tpu.nn.base import Model

    model = Model(MidasTiramisu(features=16))
    x = jnp.zeros((1, 32, 32, 3))
    params, ms = model.init(jax.random.key(0), x)
    out, _, _ = model.apply(params, ms, None, x)
    assert out.shape == (1, 32, 32, 1)  # depth map at input resolution
    assert np.all(np.asarray(out) >= 0)


def test_regression_table():
    from beyond_deep_ensembles_tpu.evals.plotting import regression_table
    from beyond_deep_ensembles_tpu.evals.regression import RegressionResults

    rng = np.random.RandomState(0)
    outs = np.stack([rng.randn(4, 10, 1), np.abs(rng.randn(4, 10, 1)) + 0.5], axis=-1)
    res = RegressionResults.create(outs, rng.randn(10, 1), key=jax.random.key(0))
    table = regression_table("UCI", [("map", [res, res])], latex=True)
    assert "Avg LML" in table and "map" in table and "\\pm" in table


def test_torch_convert_roundtrip():
    import torch

    from beyond_deep_ensembles_tpu.models.torch_convert import convert_torch_state_dict

    sd = {
        "conv.weight": torch.randn(8, 3, 3, 3),
        "fc.weight": torch.randn(2, 8),
        "fc.bias": torch.randn(2),
        "bn.running_mean": torch.randn(8),  # dropped
    }
    flax_params = {
        "Conv_0": {"kernel": jnp.zeros((3, 3, 3, 8))},
        "Dense_0": {"kernel": jnp.zeros((8, 2)), "bias": jnp.zeros((2,))},
    }
    out = convert_torch_state_dict(sd, flax_params)
    np.testing.assert_allclose(
        np.asarray(out["Conv_0"]["kernel"]),
        sd["conv.weight"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["Dense_0"]["kernel"]), sd["fc.weight"].numpy().T, rtol=1e-6
    )


def test_parallel_trainer_8dev():
    import optax

    from beyond_deep_ensembles_tpu.methods import LossOutput, map_method
    from beyond_deep_ensembles_tpu.parallel.pipelines import ParallelTrainer

    def loss_fn(params, model_state, key, batch):
        x, y = batch
        return LossOutput(loss=jnp.mean((x @ params["w"] - y) ** 2), model_state=model_state)

    method = map_method(loss_fn, optax.sgd(0.1))
    state = method.init(jax.random.key(0), {"w": jnp.zeros((4, 1))}, {})
    trainer = ParallelTrainer(method, n_members=1)
    state = trainer.place_state(state)
    x = jnp.ones((16, 4))
    y = jnp.ones((16, 1))
    state, metrics = trainer.step(state, jax.random.key(1), (x, y))
    assert np.isfinite(float(metrics["loss"]))


def test_fast_tpu_rng_noop_on_cpu():
    # the suite runs on the forced-CPU backend: the TPU RNG switch must
    # not engage (threefry keeps cross-placement determinism in tests)
    from beyond_deep_ensembles_tpu.utils.perf import enable_fast_tpu_rng

    assert enable_fast_tpu_rng() is False
    assert jax.random.normal(jax.random.key(0), ()).dtype == jnp.float32


def test_augment_matches_dynamic_slice_formulation():
    # data/cifar.py augment() is the layout-optimized (collapsed-lane
    # gather + h<->w transpose) form of the naive per-image
    # dynamic_slice crop; for the same key the two must be BIT-identical
    # (same RNG draws, same zero padding, flip folded into indices).
    from beyond_deep_ensembles_tpu.data.cifar import augment

    def augment_naive(key, images):
        b, h, w, c = images.shape
        k_crop, k_flip = jax.random.split(key)
        padded = jnp.pad(images, ((0, 0), (4, 4), (4, 4), (0, 0)))
        offsets = jax.random.randint(k_crop, (b, 2), 0, 9)

        def crop_one(img, off):
            return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

        cropped = jax.vmap(crop_one)(padded, offsets)
        flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        return jnp.where(flip[:, None, None, None], cropped[:, :, ::-1, :], cropped)

    key = jax.random.key(42)
    x = jax.random.normal(jax.random.key(1), (64, 32, 32, 3))
    out = augment(key, x)
    assert out.shape == x.shape
    assert bool(jnp.all(out == augment_naive(key, x)))
