"""Posterior methods: the TPU-native replacement for the reference's
``BayesianOptimizer`` family (reference src/algos/).

Every method is a :class:`~beyond_deep_ensembles_tpu.methods.api.PosteriorMethod`
— a bundle of pure functions (init / update / sample / finalize_epoch) whose
state is a pytree, so a whole training step jits into one XLA program and
members/particles/MC-samples become vmap axes.
"""
from .api import (  # noqa: F401
    PosteriorMethod,
    MethodState,
    LossOutput,
    GaussianPrior,
    MixturePrior,
    gaussian_kl,
    split_gaussian_labels,
)
from .map import map_method  # noqa: F401
from .bbb import bbb_method  # noqa: F401
from .swag import swag_method  # noqa: F401
from .svgd import svgd_method  # noqa: F401
from .ivon import ivon_method  # noqa: F401
from .ensemble import deep_ensemble, predict  # noqa: F401
from .laplace import laplace_method  # noqa: F401
from .sngp import sngp_method  # noqa: F401
from .last_layer import last_layer_method  # noqa: F401
from .sgmcmc import sgld, sgmcmc_method  # noqa: F401
from .vi import mfvi_method  # noqa: F401
from .hmc import hmc_method  # noqa: F401
