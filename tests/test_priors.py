"""Prior parity: GaussianPrior closed-form KL and MixturePrior surrogate
vs numpy transcriptions of the reference formulas (bbb.py:9-37)."""
import math

import jax.numpy as jnp
import numpy as np

from beyond_deep_ensembles_tpu.methods.api import GaussianPrior, MixturePrior, to_sigma


def test_gaussian_prior_kl_formula():
    rng = np.random.RandomState(0)
    mu_q = rng.randn(20).astype(np.float32)
    sig_q = np.abs(rng.randn(20)).astype(np.float32) + 0.1
    prior = GaussianPrior(0.0, 2.0)
    kl = float(prior.kl_divergence(jnp.asarray(mu_q), jnp.asarray(sig_q)))
    # reference bbb.py:20: 0.5*(2*log(sig_p/sig_q) - 1 + (sig_q/sig_p)^2
    #                           + ((mu_p - mu_q)/sig_p)^2)
    ref = 0.5 * (
        2 * np.log(2.0 / sig_q) - 1 + (sig_q / 2.0) ** 2 + (mu_q / 2.0) ** 2
    )
    np.testing.assert_allclose(kl, ref.sum(), rtol=1e-5)
    # KL(q||q-prior-shaped) at matched moments is 0
    same = GaussianPrior(0.0, 1.0)
    z = float(same.kl_divergence(jnp.zeros(5), jnp.ones(5)))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)


def test_mixture_prior_matches_reference_surrogate():
    rng = np.random.RandomState(1)
    mu_q = rng.randn(30).astype(np.float32)
    prior = MixturePrior(pi=0.7, sigma1=1.0, sigma2=0.01)

    def norm_logpdf(x, sigma):
        return -(x**2) / (2 * sigma**2) - math.log(sigma) - 0.5 * math.log(2 * math.pi)

    # reference bbb.py:31-37: clamp component log-probs to [-23, 0],
    # logaddexp with log(pi)/log(1-pi); KL surrogate = -sum log_prob(mu_q)
    p1 = math.log(0.7) + np.clip(norm_logpdf(mu_q, 1.0), -23, 0)
    p2 = math.log(0.3) + np.clip(norm_logpdf(mu_q, 0.01), -23, 0)
    ref_lp = np.logaddexp(p1, p2)
    np.testing.assert_allclose(
        np.asarray(prior.log_prob(jnp.asarray(mu_q))), ref_lp, rtol=1e-4
    )
    kl = float(prior.kl_divergence(jnp.asarray(mu_q), jnp.ones(30)))
    np.testing.assert_allclose(kl, -ref_lp.sum(), rtol=1e-4)


def test_to_sigma_softplus():
    np.testing.assert_allclose(
        float(to_sigma(jnp.asarray(0.0))), math.log(2.0), rtol=1e-6
    )
