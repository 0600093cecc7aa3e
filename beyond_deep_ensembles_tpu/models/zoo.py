"""bnn-hmc model zoo registry.

Reference: get_model (google-bnn-hmc/bnn_hmc/utils/models.py:293-318) —
the names the HMC / SG-MCMC / MFVI entry points accept. Each entry maps
to a flax module wrapped in the framework's Model calling convention."""
from __future__ import annotations

import jax
from flax import linen as nn

from ..nn.base import Model
from .cnn_lstm import CNNLSTM, smooth_cnn_lstm
from .lenet import LeNet5
from .resnet import WilsonResNet20


class MLP(nn.Module):
    """Plain flatten->Dense stack (reference make_mlp, models.py:262-283;
    regression variants emit 2 channels: mean and pre-softplus std
    consumed by the heteroscedastic Gaussian likelihood, losses.py:76-110)."""

    layer_dims: tuple = (100, 100)
    out_dim: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        x = x.reshape(x.shape[0], -1)
        for dim in self.layer_dims:
            x = nn.relu(nn.Dense(dim)(x))
        return nn.Dense(self.out_dim)(x)


def get_model(name: str, num_classes: int = 10, **kw) -> Model:
    """Mirror of the reference registry (models.py:293-318)."""
    builders = {
        "lenet": lambda: LeNet5(classes=num_classes),
        # the vendored make_resnet_fn arch (initial FRN, normalized biased
        # shortcut — models.py:95-176), NOT the torch-reference ResNet20
        "resnet20_frn": lambda: WilsonResNet20(
            classes=num_classes, activation="relu", **kw
        ),
        "resnet20_frn_swish": lambda: WilsonResNet20(
            classes=num_classes, activation="swish", **kw
        ),
        "cnn_lstm": lambda: CNNLSTM(classes=num_classes, **kw),
        "smooth_cnn_lstm": lambda: smooth_cnn_lstm(classes=num_classes, **kw),
        "mlp_regression": lambda: MLP(layer_dims=(100, 100), out_dim=2),
        "mlp_regression_small": lambda: MLP(layer_dims=(50,), out_dim=2),
        "mlp_classification": lambda: MLP(layer_dims=(256, 256), out_dim=num_classes),
        "logistic_regression": lambda: MLP(layer_dims=(), out_dim=num_classes),
    }
    if name not in builders:
        raise ValueError(f"unknown model {name!r}; available: {sorted(builders)}")
    return Model(builders[name]())
