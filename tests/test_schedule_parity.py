"""LR-schedule parity against the exact schedule objects the reference
steps: transformers.get_cosine_schedule_with_warmup (the RxRx1 per-batch
scheduler, reference rxrx1.py:128-170) and torch ExponentialLR (the
iwildcam/poverty/fmow per-epoch scheduler), compared POINTWISE over a
whole run against utils/schedules.cosine_with_warmup and
optax.exponential_decay(staircase=True) as the engine wires them."""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def test_cosine_warmup_matches_transformers():
    from beyond_deep_ensembles_tpu.utils.schedules import cosine_with_warmup

    base_lr, warmup, total = 1e-4, 40, 400
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    sched = transformers.get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=warmup, num_training_steps=total
    )
    ours = cosine_with_warmup(base_lr, warmup, total)

    # reference loop order (rxrx1.py:167): optimizer.step() consumes the
    # CURRENT lr, then scheduler.step() advances — so training step s
    # uses the scheduler's multiplier at count s.
    ref_lrs, our_lrs = [], []
    for s in range(total):
        ref_lrs.append(opt.param_groups[0]["lr"])
        sched.step()
        our_lrs.append(float(ours(s)))
    # ours evaluates in float32 (jnp): near the cosine's zero the
    # relative error of cos blows up while the absolute lr is ~1e-9 —
    # compare at fp32 precision relative to base_lr
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=2e-3, atol=1e-9)


def test_exponential_staircase_matches_torch_per_epoch():
    import optax

    base_lr, gamma, spe, epochs = 1e-3, 0.96, 7, 12
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)
    ours = optax.exponential_decay(
        base_lr, transition_steps=spe, decay_rate=gamma, staircase=True
    )

    step = 0
    for epoch in range(epochs):
        for _ in range(spe):
            np.testing.assert_allclose(
                float(ours(step)), opt.param_groups[0]["lr"], rtol=1e-6,
                err_msg=f"epoch {epoch} step {step}",
            )
            step += 1
        sched.step()  # reference steps ONCE per epoch (poverty.py:141)


def test_wilson_schedule_matches_reference():
    """Pointwise parity with the LIVE reference wilson_scheduler
    (src/algos/util.py:43-54), over both the swag_lr and default-ratio
    variants, at every epoch of a 300-epoch CIFAR run."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.algos.util import wilson_scheduler

    from beyond_deep_ensembles_tpu.utils.schedules import wilson_schedule

    for swag_lr in (None, 0.005):
        ref = wilson_scheduler(300, 0.05, swag_lr)
        ours = wilson_schedule(300, 0.05, swag_lr)
        for epoch in range(0, 320, 7):
            np.testing.assert_allclose(
                float(ours(epoch)), ref(epoch), rtol=1e-6,
                err_msg=f"epoch {epoch} swag_lr={swag_lr}",
            )
