"""Data-parallel CIFAR training path over the 8-device virtual mesh."""
import jax
import numpy as np


def test_cifar_data_parallel_tiny():
    assert jax.device_count() == 8  # conftest forces 8 CPU devices
    from beyond_deep_ensembles_tpu.experiments import cifar as C

    res = C.run_single(
        {
            "model": "map",
            "epochs": 1,
            "subsample": 256,
            "test_subsample": 250,
            "eval_samples": 2,
            "eval_batch_size": 250,
            "batch_size": 64,
            "data_parallel": True,
        }
    )
    assert np.isfinite(res["test"]["accuracy"])
    assert np.isfinite(res["test"]["avg_log_likelihood"])


def test_cifar_member_parallel_tiny():
    from beyond_deep_ensembles_tpu.experiments import cifar as C

    res = C.run_single(
        {
            "model": "map",
            "members": 2,
            "epochs": 1,
            "subsample": 128,
            "test_subsample": 125,
            "eval_samples": 2,
            "eval_batch_size": 125,
            "batch_size": 64,
            "data_parallel": True,
        }
    )
    assert np.isfinite(res["test"]["accuracy"])


def test_cifar_scan_steps_tiny():
    from beyond_deep_ensembles_tpu.experiments import cifar as C

    res = C.run_single(
        {
            "model": "map",
            "epochs": 2,
            "subsample": 192,  # 3 batches of 64: one scan chunk of 2 + 1 leftover
            "test_subsample": 100,
            "eval_samples": 2,
            "eval_batch_size": 100,
            "batch_size": 64,
            "scan_steps": 2,
        }
    )
    assert np.isfinite(res["test"]["accuracy"])


def test_epoch_runner_device_data():
    """Whole-epoch device-resident scan (parallel/multistep.py
    make_epoch_runner): equivalent learning to per-step dispatch."""
    import jax
    import jax.numpy as jnp
    import optax

    from beyond_deep_ensembles_tpu.methods import LossOutput, map_method
    from beyond_deep_ensembles_tpu.parallel.multistep import make_epoch_runner

    w_true = jnp.asarray([[1.0], [-2.0], [0.5], [2.0]])
    x = jax.random.normal(jax.random.key(0), (256, 4))
    y = x @ w_true

    def loss_fn(params, model_state, key, batch):
        xb, yb = batch
        return LossOutput(loss=jnp.mean((xb @ params["w"] - yb) ** 2), model_state=model_state)

    method = map_method(loss_fn, optax.sgd(0.1))
    state = method.init(jax.random.key(1), {"w": jnp.zeros((4, 1))}, {})
    runner = make_epoch_runner(method.update, 256, 32)
    for e in range(30):
        state, metrics = runner(state, jax.random.fold_in(jax.random.key(2), e), (x, y))
    assert float(metrics["loss"]) < 1e-3
    np.testing.assert_allclose(np.asarray(state.params["w"]), np.asarray(w_true), atol=0.05)
    assert int(state.step) == 30 * 8  # 8 steps per epoch all executed
