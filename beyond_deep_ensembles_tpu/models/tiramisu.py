"""MidasTiramisu: UNet-ish monocular-depth net.

Reference src/architectures/densenet.py:9-94 (DenseNetBlock encoder,
ResidualConvUnit / FeatureFusionBlock decoder with bilinear upsampling).
Unused by the reference's experiments (SURVEY.md §2.2) but part of the
component inventory. NHWC; bilinear resize via ``jax.image.resize``.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class DenseNetBlock(nn.Module):
    growth_rate: int
    layers: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.layers):
            new = nn.Conv(self.growth_rate, (3, 3), padding=1)(nn.relu(x))
            x = jnp.concatenate([x, new], axis=-1)
        x = nn.Conv(x.shape[-1], (1, 1))(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class ResidualConvUnit(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(x.shape[-1], (3, 3), padding=1)(nn.relu(x))
        h = nn.Conv(x.shape[-1], (3, 3), padding=1)(nn.relu(h))
        return h + x


class FeatureFusionBlock(nn.Module):
    @nn.compact
    def __call__(self, encoder_input, decoder_input):
        h = decoder_input + ResidualConvUnit()(encoder_input)
        return _upsample2x(ResidualConvUnit()(h))


class MidasTiramisu(nn.Module):
    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        x = nn.Conv(64, (3, 3), padding=1)(x)

        enc1 = DenseNetBlock(16, 4)(x)  # 64 + 64 = 128 ch
        enc2 = DenseNetBlock(16, 5)(enc1)  # 128 + 80 = 208
        enc3 = DenseNetBlock(16, 7)(enc2)  # 208 + 112 = 320
        enc4 = DenseNetBlock(16, 10)(enc3)  # 320 + 160 = 480

        f = self.features
        dec1 = _upsample2x(ResidualConvUnit()(nn.Conv(f, (3, 3), padding=1)(enc4)))
        dec2 = FeatureFusionBlock()(nn.Conv(f, (3, 3), padding=1)(enc3), dec1)
        dec3 = FeatureFusionBlock()(nn.Conv(f, (3, 3), padding=1)(enc2), dec2)
        dec4 = FeatureFusionBlock()(nn.Conv(f, (3, 3), padding=1)(enc1), dec3)

        h = nn.relu(nn.Conv(128, (3, 3), padding=1)(dec4))
        h = nn.relu(nn.Conv(32, (3, 3), padding=1)(h))
        return nn.relu(nn.Conv(1, (1, 1))(h))
