"""Parity tests: our vectorized metrics vs straight numpy transcriptions
of the reference formulas (src/eval/calibration.py, regresssion.py)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.evals import (
    CalibrationResults,
    RegressionResults,
    calculate_ace,
    calculate_ece,
    calculate_mce,
)
from beyond_deep_ensembles_tpu.evals.classification import (
    analyze_output,
    bayesian_model_average,
    binary_to_multiclass,
)
from beyond_deep_ensembles_tpu.evals.regression import gauss_logprob, nll_loss


# --- numpy transcriptions of the reference (calibration.py:67-126) ---


def ref_static_bins(bin_count, confidences):
    bins = [[] for _ in range(bin_count)]
    for i, c in enumerate(confidences):
        b = int(np.clip(np.floor(c * bin_count), 0, bin_count - 1))
        bins[b].append(i)
    return bins


def ref_adaptive_bins(bin_count, confidences):
    indices = np.argsort(confidences, kind="stable")
    chunk = -(-len(confidences) // bin_count)
    return [indices[i : i + chunk].tolist() for i in range(0, len(indices), chunk)]


def ref_mean_calib_error(bins, correct, confidences):
    accs = np.array([correct[b].sum() / len(b) if len(b) > 0 else 0 for b in bins])
    confs = np.array([confidences[b].sum() / len(b) if len(b) > 0 else 0 for b in bins])
    ece = sum(len(bins[i]) * abs(accs[i] - confs[i]) for i in range(len(bins)))
    return ece / len(confidences)


@pytest.fixture
def cls_data():
    rng = np.random.RandomState(0)
    conf = rng.uniform(0.05, 1.0, size=500)
    correct = (rng.uniform(size=500) < conf).astype(np.float32)
    return correct, conf.astype(np.float32)


def test_ece_parity(cls_data):
    correct, conf = cls_data
    ref = ref_mean_calib_error(ref_static_bins(10, conf), correct, conf)
    ours = float(calculate_ece(10, correct, conf))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_ace_parity(cls_data):
    correct, conf = cls_data
    bins = ref_adaptive_bins(10, conf)
    ref = ref_mean_calib_error(bins, correct, conf)
    ours = float(calculate_ace(10, correct, conf))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_mce_parity(cls_data):
    correct, conf = cls_data
    bins = ref_static_bins(10, conf)
    accs = np.array([correct[b].sum() / len(b) if len(b) > 0 else 0 for b in bins])
    confs = np.array([conf[b].sum() / len(b) if len(b) > 0 else 0 for b in bins])
    ref = np.max(np.abs(accs - confs))
    np.testing.assert_allclose(float(calculate_mce(10, correct, conf)), ref, rtol=1e-5)


def test_signed_ece(cls_data):
    correct, conf = cls_data
    res = CalibrationResults.create(10, correct, conf)
    bins = ref_static_bins(10, conf)
    accs = np.array([correct[b].sum() / len(b) if len(b) > 0 else 0 for b in bins])
    confs = np.array([conf[b].sum() / len(b) if len(b) > 0 else 0 for b in bins])
    counts = np.array([len(b) for b in bins])
    ref = (counts * (accs - confs)).sum() / counts.sum()
    np.testing.assert_allclose(float(res.signed_ece), ref, rtol=1e-5)
    # signed magnitude never exceeds ECE
    assert abs(float(res.signed_ece)) <= float(res.ece) + 1e-6


def test_calibration_average():
    rng = np.random.RandomState(1)
    results = [
        CalibrationResults.create(
            10, rng.uniform(size=100) < 0.8, rng.uniform(size=100).astype(np.float32)
        )
        for _ in range(3)
    ]
    avg = CalibrationResults.average(results)
    np.testing.assert_allclose(
        float(avg.ece), np.mean([float(r.ece) for r in results]), rtol=1e-6
    )


# --- regression metrics (regresssion.py:24-64) ---


def test_regression_ll_lml_parity():
    rng = np.random.RandomState(2)
    S, D = 7, 40
    means = rng.randn(S, D, 1).astype(np.float32)
    stds = np.abs(rng.randn(S, D, 1)).astype(np.float32) + 0.5
    targets = rng.randn(D, 1).astype(np.float32)
    outputs = np.stack([means, stds], axis=-1)

    res = RegressionResults.create(outputs, targets, key=jax.random.key(0))

    lls = (
        -((means - targets) ** 2) / (2 * stds**2)
        - np.log(stds)
        - 0.5 * math.log(2 * math.pi)
    )
    from scipy.special import logsumexp

    ref_ll = -D * math.log(S) + logsumexp(lls, axis=0).sum()
    ref_lml = -math.log(S) + logsumexp(lls.reshape(S, -1).sum(axis=1))
    np.testing.assert_allclose(float(res.log_likelihood), ref_ll, rtol=1e-4)
    np.testing.assert_allclose(float(res.lml), ref_lml, rtol=1e-4)
    np.testing.assert_allclose(
        float(res.mse_of_means), np.mean((means.mean(0) - targets) ** 2), rtol=1e-5
    )


def test_qce_perfect_calibration():
    # Predictive == true generative distribution -> observed cdf tracks
    # the nominal quantiles and QCE is small.
    rng = np.random.RandomState(3)
    S, D = 2000, 800
    means = np.zeros((S, D, 1), np.float32)
    stds = np.ones((S, D, 1), np.float32)
    targets = rng.randn(D, 1).astype(np.float32)
    outputs = np.stack([means, stds], axis=-1)
    res = RegressionResults.create(outputs, targets, key=jax.random.key(1))
    assert float(res.qce) < 0.05
    assert abs(float(res.sqce)) < 0.05


def test_gauss_logprob_matches_scipy():
    from scipy.stats import norm

    x = np.linspace(-2, 2, 5)
    lp = gauss_logprob(jnp.float32(0.3), jnp.float32(0.8), jnp.asarray(x, jnp.float32))
    ref = norm.logpdf(x, loc=0.3, scale=math.sqrt(0.8))
    np.testing.assert_allclose(np.asarray(lp), ref, rtol=1e-4)


def test_nll_loss_matches_reference_formula():
    rng = np.random.RandomState(4)
    out = rng.randn(16, 1, 2).astype(np.float32)
    target = rng.randn(16, 1).astype(np.float32)
    var = np.maximum(out[..., 1] ** 2, 1e-4)
    ref = np.mean(0.5 * (np.log(var) + (out[..., 0] - target) ** 2 / var))
    np.testing.assert_allclose(float(nll_loss(out, target)), ref, rtol=1e-5)


# --- classification analysis (multiclass_classification.py:30-31,163-176) ---


def test_bma_and_analyze():
    rng = np.random.RandomState(5)
    S, B, C = 6, 30, 4
    logits = rng.randn(S, B, C).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    marg = bayesian_model_average(log_probs)
    ref = np.log(np.mean(np.exp(np.asarray(log_probs)), axis=0))
    np.testing.assert_allclose(np.asarray(marg), ref, rtol=1e-3, atol=1e-5)

    target = jnp.asarray(rng.randint(0, C, size=B))
    correct, conf, ll, agree, tv = analyze_output(marg, target, marg)
    assert np.all(np.asarray(agree) == 1.0)
    np.testing.assert_allclose(np.asarray(tv), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ll), np.asarray(marg)[np.arange(B), np.asarray(target)], rtol=1e-6
    )
    assert np.all(np.asarray(conf) <= 1.0)


def test_binary_to_multiclass():
    p = jnp.asarray([[0.2], [0.9]])
    out = binary_to_multiclass(p)
    np.testing.assert_allclose(np.asarray(out), [[0.8, 0.2], [0.1, 0.9]], rtol=1e-6)
