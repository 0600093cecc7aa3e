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

import functools

import jax
import jax.numpy as jnp


def make_multi_step(update, k: int, donate: bool = False):
    """Returns multi(state, key, stacked_batches) -> (state, metrics).

    stacked_batches: pytree of arrays with leading axis k (k minibatches).
    metrics are averaged over the k steps.

    donate=True aliases the incoming state buffers (in-place update, halves
    peak state memory; callers must rebind the result). OFF by default: the
    axon TPU backend miscompiles donated iVON states inside lax.scan
    (runtime InvalidArgument; bbb/map/swag donate fine), and measured
    throughput is identical either way on this workload.
    """

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi(state, key, stacked_batches):
        keys = jax.random.split(key, k)

        def body(s, inp):
            step_key, batch = inp
            s, m = update(s, step_key, batch)
            return s, m

        state, metrics = jax.lax.scan(body, state, (keys, stacked_batches))
        # Mean over the scanned steps only — per-member metric axes survive.
        return state, {name: jnp.mean(v, axis=0) for name, v in metrics.items()}

    return multi


def stack_batches(batches):
    """List of (x, y, ...) minibatches -> stacked pytree with leading k."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *batches)


def make_epoch_runner(
    update,
    n_data: int,
    batch_size: int,
    donate: bool = False,
    epoch_transform=None,
):
    """Whole-epoch training with DEVICE-RESIDENT data.

    For datasets that fit in HBM (CIFAR-10 is ~0.6 GB) the host should
    never touch batches at all: the dataset is uploaded once, the epoch's
    shuffled order is drawn on device, and ONE jitted scan gathers each
    minibatch from HBM and runs the optimizer step. Eliminates the
    per-batch PCIe transfer that dominates wall time once the step itself
    is sub-millisecond.

    epoch_transform(key, data) -> data: optional per-epoch BULK data
    augmentation applied after the shuffle, over the whole epoch at once.
    Each example is consumed exactly once per epoch, so augmenting the
    epoch in one vectorized pass is semantically identical to augmenting
    inside every step — but it runs as one bandwidth-bound kernel instead
    of 390 gather-heavy per-step ops (measured: per-step crop+flip in the
    BBB loss cost ~4-6 ms/step of the 12 ms full-scale step, r3).

    Returns epoch(state, key, data) -> (state, metrics); data is a pytree
    of device arrays with leading axis n_data.
    """
    steps = n_data // batch_size

    # donate=True aliases state (never data — it is reused every epoch);
    # off by default, see make_multi_step.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def epoch(state, key, data):
        k_perm, k_aug, k_steps = jax.random.split(key, 3)
        perm = jax.random.permutation(k_perm, n_data)[: steps * batch_size]
        # ONE bulk gather per epoch (bandwidth-bound, ~ms for CIFAR), then
        # the scan consumes contiguous slices — per-step random gathers
        # measured ~20 ms/step, the bulk shuffle amortizes to ~nothing.
        shuffled = jax.tree.map(
            lambda d: jnp.take(d, perm, axis=0), data
        )
        if epoch_transform is not None:
            shuffled = epoch_transform(k_aug, shuffled)
        shuffled = jax.tree.map(
            lambda d: d.reshape((steps, batch_size) + d.shape[1:]), shuffled
        )
        keys = jax.random.split(k_steps, steps)
        state, metrics = jax.lax.scan(
            lambda s, inp: update(s, inp[0], inp[1]), state, (keys, shuffled)
        )
        # Mean over the scanned steps only — per-member metric axes survive.
        return state, {name: jnp.mean(v, axis=0) for name, v in metrics.items()}

    return epoch


def make_eval_runner(predict_batch, n_data: int, batch_size: int):
    """Whole-test-set evaluation with DEVICE-RESIDENT data.

    The per-batch Python eval loop pays one dispatch round-trip per test
    batch — ~30 ms each through the tunneled backend, so CIFAR's 20
    batches of 500 cost more in latency than in compute. Folding the
    loop into ONE jitted scan makes the whole posterior-predictive eval
    a single dispatch.

    predict_batch(state, key, xb) -> per-example outputs with leading
    axis batch_size (e.g. BMA log-marginals [batch, classes]).

    Returns run(state, key, x) -> outputs [n_data, ...]. The final
    partial batch is padded by edge replication on device and trimmed
    after, so every test point is evaluated exactly once — identical
    semantics to the padded host loop (experiments/cifar.py eval_model;
    reference evaluates the full loader, cifar.py:26-42).
    """
    n_batches = -(-n_data // batch_size)
    padded = n_batches * batch_size

    @jax.jit
    def run(state, key, x):
        pad = padded - n_data
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        xb = x.reshape((n_batches, batch_size) + x.shape[1:])

        def body(_, inp):
            i, xi = inp
            return None, predict_batch(state, jax.random.fold_in(key, i), xi)

        _, outs = jax.lax.scan(body, None, (jnp.arange(n_batches), xb))
        return outs.reshape((padded,) + outs.shape[2:])[:n_data]

    return run
