"""bnn_hmc experiment entries (HMC chain loop w/ ensembling + resume,
SGMCMC, VI) on a tiny classification problem, plus the Wilson-HMC
agreement pipeline with fallback samples."""
import os
import tempfile

import flax.linen as nn
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from beyond_deep_ensembles_tpu.experiments.bnn_hmc import run_hmc, run_sgmcmc, run_vi
from beyond_deep_ensembles_tpu.nn.base import Model


class TinyNet(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.relu(nn.Dense(16)(x))
        return nn.Dense(self.classes)(h)


def _blobs(n=128, d=4, classes=3, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, classes, n)
    centers = 2.0 * rng.randn(classes, d)
    x = centers[y] + 0.5 * rng.randn(n, d)
    return x.astype(np.float32), y.astype(np.int64)


def test_run_hmc_chain_with_resume():
    model = Model(TinyNet())
    train = _blobs(seed=0)
    test = _blobs(n=64, seed=1)
    with tempfile.TemporaryDirectory() as d:
        run_dir = os.path.join(d, "chain0")
        res = run_hmc(
            model,
            train,
            test,
            n_iterations=8,
            burn_in=2,
            step_size=5e-3,
            n_leapfrog=5,
            step_size_adaptation_speed=0.05,
            run_dir=run_dir,
        )
        assert len(res["metrics"]) == 8
        # resume continues from the last checkpoint
        res2 = run_hmc(
            model,
            train,
            test,
            n_iterations=10,
            burn_in=2,
            step_size=5e-3,
            n_leapfrog=5,
            run_dir=run_dir,
        )
        assert len(res2["metrics"]) == 2  # only iterations 8, 9 ran
    if "eval" in res:
        assert np.isfinite(res["eval"]["accuracy"])


def test_run_sgd_learns_blobs():
    from beyond_deep_ensembles_tpu.experiments.bnn_hmc import run_sgd

    model = Model(TinyNet())
    x, y = _blobs(n=256, seed=5)
    method, state = run_sgd(model, (x, y), n_epochs=10, batch_size=64, lr=0.05)
    p, ms = method.sample(state, jax.random.key(0))
    out, _, _ = model.apply(p, ms, None, jnp.asarray(x), train=False, mutable_state=False)
    acc = float(jnp.mean(jnp.argmax(out, -1) == jnp.asarray(y)))
    assert acc > 0.8


def test_run_sgd_resume():
    from beyond_deep_ensembles_tpu.experiments.bnn_hmc import run_sgd

    model = Model(TinyNet())
    x, y = _blobs(n=128, seed=6)
    with tempfile.TemporaryDirectory() as d:
        _, s1 = run_sgd(model, (x, y), n_epochs=3, batch_size=64, run_dir=d)
        assert int(s1.step) == 3 * 2
        # resume continues from epoch 3: only 2 more epochs of steps run
        _, s2 = run_sgd(model, (x, y), n_epochs=5, batch_size=64, run_dir=d)
        assert int(s2.step) == 5 * 2


def test_run_sgmcmc_and_vi_learn_blobs():
    model = Model(TinyNet())
    x, y = _blobs(n=256, seed=2)

    method, state = run_sgmcmc(
        model, (x, y), n_epochs=8, batch_size=64, step_size=1e-4, momentum_decay=0.9
    )
    p, ms = method.sample(state, jax.random.key(0), 0)
    out, _, _ = model.apply(p, ms, None, jnp.asarray(x), train=False, mutable_state=False)
    acc = float(jnp.mean(jnp.argmax(out, -1) == jnp.asarray(y)))
    assert acc > 0.5

    method, state = run_vi(model, (x, y), n_epochs=8, batch_size=64, lr=5e-3)
    p, ms = method.sample(state, jax.random.key(0))
    out, _, _ = model.apply(p, ms, None, jnp.asarray(x), train=False, mutable_state=False)
    acc = float(jnp.mean(jnp.argmax(out, -1) == jnp.asarray(y)))
    assert acc > 0.5


@pytest.mark.slow
def test_wilson_hmc_agreement_pipeline():
    from beyond_deep_ensembles_tpu.data.wilson import WilsonHMC
    from beyond_deep_ensembles_tpu.evals.classification import analyze_output

    hmc = WilsonHMC(seed=0)  # fallback: perturbed random draws
    x = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    lp = hmc.infer(x)
    assert lp.shape[1:] == (8, 10)
    marg = hmc.log_marginal(x)
    np.testing.assert_allclose(np.asarray(jnp.exp(marg)).sum(-1), 1.0, rtol=1e-3)
    correct, conf, ll, agree, tv = analyze_output(
        marg, jnp.zeros(8, jnp.int32), marg
    )
    assert np.all(np.asarray(agree) == 1.0)
    np.testing.assert_allclose(np.asarray(tv), 0.0, atol=1e-6)
