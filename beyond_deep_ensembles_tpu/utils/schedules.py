"""Learning-rate schedules from the reference, as optax-compatible
step->factor functions.

The reference propagates LRs between nested optimizers with ``apply_lr``
(src/algos/opt_util.py) and epoch-level LambdaLR schedulers; in optax a
schedule is just a function of the step count composed into the
transformation chain, so only the shapes of the schedules themselves
need porting.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def wilson_schedule(pretrain_epochs: int, lr_init: float, swag_lr: Optional[float] = None):
    """Wilson et al. SWAG schedule (reference src/algos/util.py:43-54):
    flat, linear decay from 50% to 90%, then flat at the SWA LR.
    Trace-safe: ``epoch`` may be a jax scalar."""
    lr_ratio = swag_lr / lr_init if swag_lr is not None else 0.01

    def factor(epoch):
        t = epoch / pretrain_epochs
        decay = 1.0 - (1.0 - lr_ratio) * (t - 0.5) / 0.4
        return jnp.where(t <= 0.5, 1.0, jnp.where(t <= 0.9, decay, lr_ratio))

    return factor


def step_schedule(milestones: Sequence[int], gamma: float):
    """MultiStep decay (reference src/algos/util.py:29-41). Trace-safe."""
    ms = jnp.asarray(list(milestones))

    def factor(epoch):
        return gamma ** jnp.sum(ms <= epoch)

    return factor


def epoch_schedule_to_step(factor_fn, steps_per_epoch: int, base_lr: float):
    """Wrap an epoch-level factor schedule as an optax step schedule."""

    def schedule(step):
        return base_lr * factor_fn(step // steps_per_epoch)

    return schedule
