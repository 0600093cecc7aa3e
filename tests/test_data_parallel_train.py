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
