"""SVGD op tests: XLA path vs reference formulas, Pallas kernel in
interpreter mode vs XLA path."""
import jax
import jax.numpy as jnp
import numpy as np

from beyond_deep_ensembles_tpu.ops.svgd_kernel import (
    _gram_pallas,
    pairwise_sq_dists,
    rbf_phi,
)


def test_pairwise_sq_dists_xla():
    rng = np.random.RandomState(0)
    x = rng.randn(6, 33).astype(np.float32)
    d2 = pairwise_sq_dists(jnp.asarray(x), use_pallas=False)
    ref = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), ref, rtol=1e-4, atol=1e-4)


def test_gram_pallas_interpret():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 700).astype(np.float32))
    gram = _gram_pallas(x, tile_p=256, interpret=True)
    ref = np.asarray(x) @ np.asarray(x).T
    np.testing.assert_allclose(np.asarray(gram), ref, rtol=1e-4, atol=1e-4)


def test_rbf_phi_matches_reference_composition():
    """phi computed via the fused [n,2n]@[2n,P] matmul must equal the
    three-term reference composition (svgd.py:86-89)."""
    rng = np.random.RandomState(2)
    n, p = 8, 50
    particles = rng.randn(n, p).astype(np.float32)
    grads = rng.randn(n, p).astype(np.float32)
    scale, dataset_size = 1.3, 200

    phi = rbf_phi(
        jnp.asarray(particles),
        jnp.asarray(grads),
        kernel_grad_scale=scale,
        dataset_size=dataset_size,
        use_pallas=False,
    )

    d2 = ((particles[:, None, :] - particles[None, :, :]) ** 2).sum(-1)
    med = np.quantile(d2, 0.5)
    h = np.sqrt(0.5 * med / np.log(n + 1)) + 1e-8
    kernel = np.exp(-d2 / (2 * h**2))
    grad_kernel = (kernel.sum(1)[:, None] * particles - kernel @ particles) / h**2
    ref_phi = kernel @ (-grads) + scale * grad_kernel / dataset_size
    np.testing.assert_allclose(np.asarray(phi), ref_phi, rtol=1e-3, atol=1e-4)


def test_rbf_phi_h_override():
    rng = np.random.RandomState(3)
    particles = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    grads = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    phi = rbf_phi(particles, grads, 1.0, 100, h_override=2.0, use_pallas=False)
    assert phi.shape == (4, 10)
    assert np.all(np.isfinite(np.asarray(phi)))
