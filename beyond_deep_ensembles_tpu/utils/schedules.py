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


def cosine_with_warmup(base_lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup then cosine decay, stepped PER BATCH — the RxRx1 /
    HF-transformers schedule (reference rxrx1.py:128-170)."""

    def schedule(step):
        warm = base_lr * jnp.minimum(step, warmup_steps) / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        decay = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def cyclical_cosine(base_lr: float, cycle_steps: int, burnin_steps: int = 0):
    """Constant during burn-in, then cyclical cosine restarts — the
    cSG-MCMC schedule, POINTWISE-exact vs the reference
    (bnn_hmc/utils/optim_utils.py:60-67) including its ``- 1`` phase
    offset: the first post-burn-in step still runs at ``base_lr`` and the
    cycle clock starts one step later (verified against the live
    reference schedule in tests/test_e2e_bnn_hmc_parity.py)."""

    def schedule(step):
        t = jnp.maximum(step - burnin_steps - 1, 0.0) % cycle_steps
        return 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * t / cycle_steps))

    return schedule


def constant_with_cosine_burnin(init_lr: float, final_lr: float, burnin_steps: int):
    """Cosine ramp from init to final over burn-in, then constant
    (reference bnn_hmc/utils/optim_utils.py:30-42)."""

    def schedule(step):
        t = jnp.clip(step / jnp.maximum(burnin_steps, 1), 0.0, 1.0)
        coef = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return coef * init_lr + (1 - coef) * final_lr

    return schedule
