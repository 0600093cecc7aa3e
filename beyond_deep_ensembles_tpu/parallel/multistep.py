"""Multi-step training chunks: scan K optimizer steps in ONE jitted call.

The reference's train loop dispatches every minibatch from Python
(SURVEY.md §3.1 "HOT LOOP (host-driven)"). Because PosteriorMethod
updates are pure, K steps fold into a single ``lax.scan`` program — the
host pays one dispatch per K batches and the device never idles between
steps. This is the knob that turns launch-bound small-model training
(BBB ResNet-20 is ~60% launch/dispatch overhead at batch 128) into
device-bound throughput.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_multi_step(update, k: int):
    """Returns multi(state, key, stacked_batches) -> (state, metrics).

    stacked_batches: pytree of arrays with leading axis k (k minibatches).
    metrics are averaged over the k steps.
    """

    @jax.jit
    def multi(state, key, stacked_batches):
        keys = jax.random.split(key, k)

        def body(s, inp):
            step_key, batch = inp
            s, m = update(s, step_key, batch)
            return s, m

        state, metrics = jax.lax.scan(body, state, (keys, stacked_batches))
        return state, {name: jnp.mean(v) for name, v in metrics.items()}

    return multi


def stack_batches(batches):
    """List of (x, y, ...) minibatches -> stacked pytree with leading k."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *batches)
