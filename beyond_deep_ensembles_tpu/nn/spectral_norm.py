"""Spectral normalization with a max-norm bound.

Reference src/algos/kernel/spectral_norm.py (a fork of PyTorch's
parametrization): power iteration estimates the top singular value sigma
of the weight viewed as a (fan_out, fan_in) matrix, then the weight is
scaled by 1 / max(1, sigma / norm_bound) (reference spectral_norm.py:123-130)
— i.e. the spectral norm is CAPPED at norm_bound, not normalized to 1.

Functional design: the power-iteration vector ``u`` lives in the
``spectral_norm`` mutable collection (part of model_state) and advances
``power_iterations`` times per TRAINING forward. Like the reference it
warms up with 15 iterations at construction (spectral_norm.py:50, done
in the variable initializer against the initial kernel) so the bound is
accurate from step 0.
"""
from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .convops import conv2d

COLLECTION = "spectral_norm"


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def _spectral_scale(module: nn.Module, name: str, w2d: jax.Array, norm_bound: float,
                    power_iterations: int, train: bool):
    """Returns the scale factor 1/max(1, sigma/norm_bound) for matrix w2d
    of shape [out, in], advancing the power-iteration state in train mode."""
    out_dim = w2d.shape[0]

    def _warm_u():
        # The reference warms up with 15 power iterations at construction
        # (spectral_norm.py:50 n_power_iterations=15 warmup in __init__) so
        # sigma is accurate from step 0; matching that matters once the cap
        # activates mid-training — a lagging estimate under-caps the weight
        # and systematically changes the dynamics (found by the SNGP e2e
        # differential track).
        u = _l2_normalize(jax.random.normal(jax.random.key(17), (out_dim,)))
        w = jax.lax.stop_gradient(w2d)
        for _ in range(15):
            v = _l2_normalize(w.T @ u)
            u = _l2_normalize(w @ v)
        return u

    u_var = module.variable(COLLECTION, name + "_u", _warm_u)
    u = u_var.value
    for _ in range(power_iterations):
        v = _l2_normalize(w2d.T @ u)
        u = _l2_normalize(w2d @ v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    if train and not module.is_initializing():
        u_var.value = u
    sigma = u @ w2d @ v
    return 1.0 / jnp.maximum(1.0, sigma / norm_bound)


class SpectralNormDense(nn.Module):
    """Dense layer with capped spectral norm
    (reference spectrally_normalize_module on nn.Linear, kernel/base.py:6-17)."""

    features: int
    norm_bound: float = 6.0
    power_iterations: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        scale = _spectral_scale(
            self, "kernel", kernel.T, self.norm_bound, self.power_iterations, train
        )
        out = x @ (kernel * scale)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


class SpectralNormConv(nn.Module):
    """Conv layer with capped spectral norm of the (out, in*kh*kw)
    unfolded kernel (the reference normalizes the torch conv weight viewed
    as (out_channels, -1)). NHWC / HWIO."""

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int, Sequence] = 0
    norm_bound: float = 6.0
    power_iterations: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, in_features, self.features)
        )
        w2d = kernel.reshape(-1, self.features).T  # [out, in*kh*kw]
        scale = _spectral_scale(
            self, "kernel", w2d, self.norm_bound, self.power_iterations, train
        )
        strides = (
            (self.strides, self.strides) if isinstance(self.strides, int) else tuple(self.strides)
        )
        padding = (
            [(self.padding, self.padding)] * 2 if isinstance(self.padding, int) else self.padding
        )
        # conv2d lowers 1x1 kernels to dot_general (nn/convops.py: XLA
        # SPMD member-sharding miscompile workaround + MXU path)
        out = conv2d(x, kernel * scale, strides, padding)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out
