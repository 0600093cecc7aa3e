"""Bayesian / stochastic layers and the model wrapper.

TPU-native (flax.linen, functional) counterparts of reference
src/algos/bbb_layers.py, rank1.py, dropout.py, src/architectures/frn.py,
gauss.py and src/algos/kernel/.
"""
from .base import Model, KL_COLLECTION, sow_kl  # noqa: F401
from .gaussian import gaussian_param, gaussian_sample  # noqa: F401
from .bbb import BBBDense, BBBConv, LowRankBBBDense  # noqa: F401
from .rank1 import Rank1Dense, Rank1Conv  # noqa: F401
from .dropout import FixableDropout  # noqa: F401
from .frn import FilterResponseNorm, VariationalFilterResponseNorm  # noqa: F401
from .gauss import GaussLayer  # noqa: F401
from .sngp import SNGPHead, RandomFourierFeatures  # noqa: F401
from .spectral_norm import SpectralNormDense, SpectralNormConv  # noqa: F401
