"""Rank-1 variational layers (https://arxiv.org/abs/2005.07186).

Reference src/algos/rank1.py: a shared deterministic kernel with
per-component rank-1 multiplicative Gaussian factors s (input side) and
r (output side), plus a per-component deterministic bias.

TPU-native departure from the reference: the components live on a leading
axis of the factor parameters (instead of a ``ModuleList`` of
``GaussianParameter``s, rank1.py:20-24) and the active component is an
explicit traced index argument, so mixture members can be vmapped. The
reference's implicit per-forward ``component_counter`` (rank1.py:32,63) is
cycled by the BBB method across its MC samples instead.

The Gaussian factors use the ``__gmean``/``__grho`` convention: the BBB
method collects their closed-form KL over ALL components, matching the
reference where every component's GaussianParameter registers a KL hook.
"""
from __future__ import annotations

import math
from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .convops import conv2d
from .gaussian import gaussian_param, sign_mean_init


def _take_component(arr, component):
    return jnp.take(arr, component, axis=0)


def _resolve_component(module, component, components):
    """Explicit index when given; otherwise a uniform draw over the
    mixture — the reference cycles a per-layer counter across forwards
    (rank1.py:63); one uniform component per posterior sample is the
    distributionally-equivalent stateless form."""
    if component is not None:
        return component
    if components == 1:
        return 0
    return jax.random.randint(module.make_rng("noise"), (), 0, components)


def _sample_factor(module, name, components, dim, component):
    mean, std = gaussian_param(module, name, (components, dim), mean_init=sign_mean_init())
    m = _take_component(mean, component)
    s = _take_component(std, component)
    eps = jax.random.normal(module.make_rng("noise"), m.shape, m.dtype)
    return m + s * eps


def _uniform_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Rank1Dense(nn.Module):
    """Reference Rank1Linear (rank1.py:9-64)."""

    features: int
    components: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        del train
        in_features = x.shape[-1]
        component = _resolve_component(self, component, self.components)
        s = _sample_factor(self, "s", self.components, in_features, component)
        r = _sample_factor(self, "r", self.components, self.features, component)

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        out = ((x * s).astype(self.dtype) @ kernel.astype(self.dtype)) * r
        if self.use_bias:
            bias = self.param(
                "bias", _uniform_bias_init(in_features), (self.components, self.features)
            )
            out = out + _take_component(bias, component)
        return out


class Rank1Conv(nn.Module):
    """Reference Rank1Conv2D (rank1.py:66-125). NHWC / HWIO layout."""

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int, Sequence] = 0
    components: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        del train
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        component = _resolve_component(self, component, self.components)
        s = _sample_factor(self, "s", self.components, in_features, component)
        r = _sample_factor(self, "r", self.components, self.features, component)

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, in_features, self.features)
        )
        strides = (
            (self.strides, self.strides) if isinstance(self.strides, int) else tuple(self.strides)
        )
        padding = (
            [(self.padding, self.padding)] * 2 if isinstance(self.padding, int) else self.padding
        )
        # conv2d lowers 1x1 kernels to dot_general (nn/convops.py: XLA
        # SPMD member-sharding miscompile workaround + MXU path)
        out = conv2d(
            (x * s).astype(self.dtype),
            kernel.astype(self.dtype),
            strides,
            padding,
            preferred_element_type=jnp.float32,
        )
        out = out * r
        if self.use_bias:
            fan_in = in_features * kh * kw
            bias = self.param(
                "bias", _uniform_bias_init(fan_in), (self.components, self.features)
            )
            out = out + _take_component(bias, component)
        return out
