"""Loss-surface plane, STL-10 loader, eval_hmc pipeline."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np


def test_loss_surface_plane():
    from beyond_deep_ensembles_tpu.evals.surface import loss_surface

    # quadratic bowl: minimum at w*
    w_star = {"w": jnp.asarray([1.0, -2.0, 3.0])}

    def loss(p):
        return jnp.sum((p["w"] - w_star["w"]) ** 2)

    p0 = {"w": jnp.zeros(3)}
    p1 = {"w": jnp.asarray([2.0, 0.0, 0.0])}
    p2 = {"w": jnp.asarray([0.0, 2.0, 0.0])}
    xs, ys, vals, coords = loss_surface(loss, p0, p1, p2, grid=9)
    assert vals.shape == (9, 9)
    assert np.all(np.isfinite(np.asarray(vals)))
    # anchors: p0 at (0,0); value there must match direct evaluation
    i = int(np.argmin(np.abs(np.asarray(xs))))
    j = int(np.argmin(np.abs(np.asarray(ys))))
    np.testing.assert_allclose(float(vals[i, j]), float(loss(p0)), atol=0.5)


def test_stl10_loader_shapes():
    from beyond_deep_ensembles_tpu.data.cifar import load_stl10_test

    x, y = load_stl10_test(subsample=64)
    assert x.shape == (64, 32, 32, 3)
    assert y.shape == (64,)
    assert np.isfinite(x).all()


@pytest.mark.slow
def test_eval_hmc_pipeline():
    from beyond_deep_ensembles_tpu.experiments.cifar import eval_hmc

    res = eval_hmc({"test_subsample": 64, "eval_batch_size": 32})
    # self-agreement must be perfect (the baseline IS the model)
    assert res["hmc_agreement"] == 1.0
    assert abs(res["hmc_total_variation"]) < 1e-6
    assert np.isfinite(res["accuracy"])


@pytest.mark.slow
def test_cifar_corrupted_eval():
    """CIFAR-10-C evaluation splits flow through run_single (reference
    cifar.py corrupted loop; synthetic noise fallback when the Hendrycks
    files are not staged)."""
    from beyond_deep_ensembles_tpu.experiments import cifar as C

    res = C.run_single(
        {
            "model": "map",
            "epochs": 1,
            "subsample": 256,
            "test_subsample": 96,
            "eval_samples": 2,
            "eval_batch_size": 96,
            "batch_size": 64,
            "corrupted_intensities": [0, 2],
        }
    )
    assert "corrupted0" in res and "corrupted2" in res
    assert np.isfinite(res["corrupted2"]["ece"])
    assert np.isfinite(res["corrupted0"]["avg_log_likelihood"])
