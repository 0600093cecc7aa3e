"""TPU performance knobs.

fast_tpu_rng: the default threefry2x32 PRNG computes its bits with many
vector ops and materializes them through HBM — on the BBB ResNet-20
train step (~24M activation-noise draws/step, local reparameterization)
it accounts for ~25% of step time (measured 4.1 -> 3.0 ms/step with
'rbg'). XLA's RngBitGenerator ('rbg') uses the hardware-accelerated
generator instead. Trade-off: rbg streams are only guaranteed stable
within a compilation, so cross-placement bitwise-equality tests and the
CPU test suite keep threefry (this helper is a no-op off-TPU).
"""
from __future__ import annotations

import os


def enable_fast_tpu_rng() -> bool:
    """Switch the default PRNG to 'rbg' when running on a TPU backend.
    Opt out with BDE_FAST_RNG=0. Returns True if switched."""
    if os.environ.get("BDE_FAST_RNG", "1") in ("0", "false", "no"):
        return False
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        return True
    except Exception:
        return False


def init_on_host(build_state):
    """Run eager init code on the host CPU backend, then transfer once.

    Unjitted init (flax module.init, optax tx.init) executes op by op;
    through the tunneled TPU backend every tiny op costs a ~1-2 min
    compile+RPC round trip, so building initial state on-device burns
    whole benchmark budgets. Falls back to building in place when the
    runtime exposes no CPU platform."""
    import jax

    dev = jax.devices()[0]
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return build_state()
    with jax.default_device(cpu):
        state = build_state()

    # device_put array leaves only: builders may return non-pytree
    # containers (e.g. experiments.wilds_task.BuiltExperiment), whose
    # interior arrays then stay uncommitted on the CPU and migrate
    # lazily at the first jitted call — device_put on the container
    # itself would raise "cannot interpret as abstract array".
    def _put(x):
        return jax.device_put(x, dev) if isinstance(x, jax.Array) else x

    return jax.tree.map(_put, state)
