"""Layer-type factories: plain / BBB / Rank-1 dense and conv layers.

The reference threads ``variational`` / ``rank1`` flags plus prior and
component arguments through every architecture constructor
(reference src/architectures/resnet.py:30-52, densenet.py:98-125); here a
factory string selects the layer class and architectures stay agnostic.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
from flax.linen import initializers
from flax.linen.dtypes import promote_dtype

from ..nn.bbb import BBBConv, BBBDense
from ..nn.convops import conv2d
from ..nn.rank1 import Rank1Conv, Rank1Dense
from ..nn.spectral_norm import SpectralNormConv, SpectralNormDense

DenseFactory = str  # 'plain' | 'bbb' | 'rank1' | 'spectral'
ConvFactory = str


class Conv(nn.Module):
    """Plain 2-D convolution. Parameter names, shapes and initializers
    match ``flax.linen.Conv`` exactly (param paths stay ``Conv_N/kernel``
    so torch-weight transplant and checkpoints are unaffected); the
    compute goes through :func:`..nn.convops.conv2d`, which lowers 1x1
    kernels to ``dot_general`` — see that module for the XLA SPMD
    correctness + MXU rationale."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence] = "VALID"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[object] = None
    kernel_init: object = initializers.lecun_normal()
    bias_init: object = initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        out = conv2d(x, kernel, self.strides, self.padding, precision=self.precision)
        if bias is not None:
            out = out + bias
        return out


def make_dense(
    kind: str, features: int, use_bias: bool = True, components: int = 1, **kwargs
) -> nn.Module:
    if kind == "plain":
        return nn.Dense(features, use_bias=use_bias, dtype=kwargs.get("dtype"))
    if kind == "bbb":
        return BBBDense(features, use_bias=use_bias, **kwargs)
    if kind == "rank1":
        return Rank1Dense(features, use_bias=use_bias, components=components, **kwargs)
    if kind == "spectral":
        return SpectralNormDense(features, use_bias=use_bias, **kwargs)
    raise ValueError(f"unknown dense kind {kind!r}")


def make_conv(
    kind: str,
    features: int,
    kernel_size: Sequence[int],
    strides: Union[int, Sequence[int]] = 1,
    padding: Union[str, int] = 0,
    use_bias: bool = True,
    components: int = 1,
    **kwargs,
) -> nn.Module:
    if kind == "plain":
        pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
        s = (strides, strides) if isinstance(strides, int) else tuple(strides)
        return Conv(
            features, kernel_size, strides=s, padding=pad, use_bias=use_bias,
            dtype=kwargs.get("dtype"),
        )
    if kind == "bbb":
        return BBBConv(
            features, kernel_size, strides=strides, padding=padding, use_bias=use_bias, **kwargs
        )
    if kind == "rank1":
        return Rank1Conv(
            features,
            kernel_size,
            strides=strides,
            padding=padding,
            use_bias=use_bias,
            components=components,
            **kwargs,
        )
    if kind == "spectral":
        return SpectralNormConv(
            features, kernel_size, strides=strides, padding=padding, use_bias=use_bias, **kwargs
        )
    raise ValueError(f"unknown conv kind {kind!r}")


def call_layer(layer: nn.Module, x, train: bool, component=None):
    """Invoke a factory-made layer with the right signature."""
    if isinstance(layer, (Rank1Dense, Rank1Conv)):
        return layer(x, train=train, component=component)
    if isinstance(layer, (BBBDense, BBBConv, SpectralNormDense, SpectralNormConv)):
        return layer(x, train=train)
    return layer(x)
