"""LeNet-5 (bnn-hmc model zoo).

Reference: make_lenet5_fn (google-bnn-hmc/bnn_hmc/utils/models.py:46-69):
three SAME 5x5 conv + relu + 3/2 VALID max-pool stages (6, 16, 120
channels), then Dense 84 -> relu -> Dense classes. Used by the HMC /
SG-MCMC / MFVI entries on MNIST/CIFAR, so it is a plain deterministic
module (parameter-space posteriors sample whole parameter trees)."""
from __future__ import annotations

from flax import linen as nn


class LeNet5(nn.Module):
    classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        for ch in (6, 16, 120):
            x = nn.Conv(ch, (5, 5), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(84)(x))
        return nn.Dense(self.classes)(x)
