"""bnn-hmc model zoo: registry parity with the reference get_model
(bnn_hmc/utils/models.py:293-318), LeNet + IMDB CNN-LSTM smoke runs
under the HMC method, IMDB loader schema."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.data.imdb import MAX_LEN, load_imdb, write_imdb_cache
from beyond_deep_ensembles_tpu.models import get_model


@pytest.mark.parametrize(
    "name,example,out_dim",
    [
        ("lenet", np.zeros((2, 28, 28, 1), np.float32), 10),
        ("mlp_regression_small", np.zeros((2, 6), np.float32), 2),
        ("mlp_classification", np.zeros((2, 6), np.float32), 10),
        ("logistic_regression", np.zeros((2, 6), np.float32), 10),
        ("cnn_lstm", np.zeros((2, MAX_LEN), np.int32), 2),
    ],
)
def test_zoo_shapes(name, example, out_dim):
    classes = 2 if "lstm" in name else 10
    model = get_model(name, num_classes=classes)
    params, state = model.init(jax.random.key(0), jnp.asarray(example))
    out, _, _ = model.apply(params, state, None, jnp.asarray(example), train=False)
    assert out.shape == (2, out_dim)


def test_zoo_unknown_name():
    with pytest.raises(ValueError, match="unknown model"):
        get_model("resnet9000")


def test_imdb_loader_and_cache(tmp_path, monkeypatch):
    x, y = load_imdb("train", subsample=32)
    assert x.shape == (32, MAX_LEN) and x.dtype == np.int32
    assert set(np.unique(y)) <= {0, 1}

    monkeypatch.setenv("BDE_DATA_DIR", str(tmp_path))
    write_imdb_cache(x, y, x[:8], y[:8])
    xt, yt = load_imdb("test")
    assert xt.shape == (8, MAX_LEN)
    with pytest.raises(ValueError, match="token ids"):
        write_imdb_cache(np.full((2, MAX_LEN), 10**6), [0, 1], x[:1], y[:1])


@pytest.mark.slow
def test_lenet_hmc_smoke():
    from beyond_deep_ensembles_tpu.experiments.bnn_hmc import run_hmc

    rng = np.random.RandomState(0)
    # 16x16 is the smallest input that survives the three 3/2 max-pools
    x = rng.rand(64, 16, 16, 1).astype(np.float32)
    y = rng.randint(0, 10, 64)
    model = get_model("lenet", num_classes=10)
    out = run_hmc(
        model, (x, y), (x[:16], y[:16]), n_iterations=2, burn_in=1, n_leapfrog=3
    )
    assert np.isfinite(out["metrics"][-1]["log_likelihood"])


@pytest.mark.slow
def test_cnn_lstm_hmc_smoke():
    from beyond_deep_ensembles_tpu.experiments.bnn_hmc import run_hmc
    from beyond_deep_ensembles_tpu.models import smooth_cnn_lstm
    from beyond_deep_ensembles_tpu.nn.base import Model

    x, y = load_imdb("train", subsample=32)
    # shrink vocab/width for a CPU smoke run; architecture unchanged
    model = Model(
        smooth_cnn_lstm(
            classes=2, max_features=2048, embedding_size=16, cell_size=16, num_filters=8
        )
    )
    xs = np.minimum(x, 2047)
    out = run_hmc(
        model, (xs, y), (xs[:8], y[:8]), n_iterations=2, burn_in=1, n_leapfrog=2
    )
    assert np.isfinite(out["metrics"][-1]["log_likelihood"])
