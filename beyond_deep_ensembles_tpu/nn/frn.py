"""Filter Response Normalization (https://arxiv.org/abs/1911.09737).

Reference src/architectures/frn.py. NHWC layout: statistics over the
spatial axes (1, 2), per-channel parameters.

Deliberate fixes vs the reference (SURVEY.md "known warts"):
  * the variational version samples with *normal* noise — the reference
    used ``torch.rand_like`` (uniform) by mistake (frn.py:45-51);
  * its beta KL uses beta's own sigma — the reference passed gamma's
    (frn.py:58-59);
  * its Gaussian parameters use the ``__gmean``/``__grho`` convention so
    their KL is actually collected by the BBB method — the reference's
    plain ``tau_mu``/``tau_rho`` parameters were invisible to
    BBBOptimizer's KL collection (bbb.py:70-76) and silently L2-regularized
    instead.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .gaussian import eval_noise, gaussian_param


class FilterResponseNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        c = x.shape[-1]
        tau = self.param("tau", nn.initializers.zeros, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        nu2 = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True)
        x = x * jax.lax.rsqrt(nu2 + self.eps)
        y = gamma * x + beta
        return jnp.maximum(y, tau)


class VariationalFilterResponseNorm(nn.Module):
    eps: float = 1e-6
    rho_init: float = -3.0
    freeze_on_eval: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]

        def gp(name, init):
            return gaussian_param(
                self, name, (c,), mean_init=init, rho_init=self.rho_init
            )

        tau_mean, tau_std = gp("tau", nn.initializers.zeros)
        beta_mean, beta_std = gp("beta", nn.initializers.zeros)
        gamma_mean, gamma_std = gp("gamma", nn.initializers.ones)

        eps_t = eval_noise(self, (x.shape[0], c), train, self.freeze_on_eval)
        eps_b = eval_noise(self, (x.shape[0], c), train, self.freeze_on_eval)
        eps_g = eval_noise(self, (x.shape[0], c), train, self.freeze_on_eval)
        # Per-example parameter draws, broadcast over the spatial dims.
        tau = (tau_mean + tau_std * eps_t)[:, None, None, :]
        beta = (beta_mean + beta_std * eps_b)[:, None, None, :]
        gamma = (gamma_mean + gamma_std * eps_g)[:, None, None, :]

        nu2 = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True)
        x = x * (nu2 + self.eps) ** -0.5
        y = gamma * x + beta
        return jnp.maximum(y, tau)
