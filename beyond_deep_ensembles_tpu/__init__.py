"""TPU-native Bayesian deep learning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
Beyond-Deep-Ensembles benchmark suite (NeurIPS 2023, reference layout in
SURVEY.md): MAP, MC-Dropout, Deep Ensembles, Bayes-By-Backprop, Rank-1 VI,
SWAG, SVGD, iVON, Laplace, SNGP and MultiX ensembling, re-designed as
pure-functional, jittable *posterior methods* instead of the reference's
closure-driven ``torch.optim`` subclasses (reference: src/algos/algo.py:5-55).

Design pillars (TPU-first):
  * every training step is a single jitted function; MC samples, SVGD
    particles and ensemble members are ``vmap``/``lax.scan`` axes, never
    Python loops (reference looped on the host: src/algos/bbb.py:63-67,
    src/algos/svgd.py:67, src/algos/ensemble.py:39-43);
  * posterior state (SWAG moments, SVGD particles, iVON precision) lives
    on device as pytrees — no CPU round trips (contrast swag.py:100);
  * multi-chip scaling via ``jax.sharding.Mesh`` with named data/member
    axes (see ``beyond_deep_ensembles_tpu.parallel``);
  * bf16 compute / fp32 state; no AMP GradScaler machinery (reference
    algo.py:44-80 is deleted by design).
"""

__version__ = "0.1.0"

from . import tree  # noqa: F401
from .methods.api import PosteriorMethod, LossOutput  # noqa: F401
