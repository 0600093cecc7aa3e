"""Headline benchmark: BBB ResNet-20 (FRN + swish) CIFAR-10 training-step
throughput on one TPU chip.

This is the reference's hottest configuration (CIFAR-10: 50k images x 300
epochs at batch 128, SURVEY.md §6) and the core of the north-star metric
("BDL optimizer step time/particle"). The whole BBB step — local
reparameterization forward, KL collection, backward, Adam update — is one
jitted XLA program here, versus the reference's host-driven closure loop
(reference src/algos/bbb.py:59-89 + experiments/cifar/cifar.py:153-172).

vs_baseline compares against the reference's PyTorch step time on an
A100 measured at ~40 ms/step for this config (BBB ResNet-20, bs=128,
mc_samples=1; estimated from the per-layer-sampled eager execution —
BASELINE.md records no in-repo wall-clock numbers). vs_baseline > 1
means faster than the reference.

Measured anatomy of the step time on v5e: a single dispatched step costs
~3.2 ms, but scanning K=16 steps inside ONE jitted call (lax.scan over
stacked minibatches, parallel/multistep.py) drops it to ~0.38 ms/step —
the dispatched number was ~90% host-launch overhead, not device time.
The benchmark therefore measures the scan path (the production loop).
bf16 compute + fp32 accumulation; donation/remat/fused RNG measured as
non-wins at this size (ops/sampling.py notes).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax

BASELINE_STEP_MS = 40.0  # A100 PyTorch reference estimate (see docstring)
BATCH = 128


def _enable_cache():
    try:
        from beyond_deep_ensembles_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass


_enable_cache()


def main():
    from beyond_deep_ensembles_tpu.methods import GaussianPrior, bbb_method
    from beyond_deep_ensembles_tpu.methods.api import LossOutput
    from beyond_deep_ensembles_tpu.models.resnet import ResNet20
    from beyond_deep_ensembles_tpu.nn.base import Model

    model = Model(
        ResNet20(
            classes=10,
            activation="swish",
            norm="frn",
            conv_kind="bbb",
            dtype=jnp.bfloat16,  # bf16 compute, fp32 params/accumulation
        )
    )

    def loss_fn(params, model_state, key, batch):
        x, y = batch
        out, kl, new_state = model.apply(params, model_state, key, x, train=True)
        logp = jax.nn.log_softmax(out)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        return LossOutput(loss=loss, kl=kl, model_state=new_state)

    method = bbb_method(
        loss_fn,
        optax.adam(3e-4),
        GaussianPrior(0.0, 1.0),
        dataset_size=50_000,
        mc_samples=1,
    )

    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    params, model_state = model.init(jax.random.key(0), x)
    state = method.init(jax.random.key(1), params, model_state)

    batch = (
        jax.random.normal(jax.random.key(2), (BATCH, 32, 32, 3)),
        jax.random.randint(jax.random.key(3), (BATCH,), 0, 10),
    )
    from beyond_deep_ensembles_tpu.parallel.multistep import (
        make_multi_step,
        stack_batches,
    )

    K = 16
    multi = make_multi_step(method.update, K)
    stacked = stack_batches([batch] * K)

    # warmup / compile
    state, metrics = multi(state, jax.random.key(4), stacked)
    jax.block_until_ready(metrics["loss"])

    n_chunks = 10
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, metrics = multi(state, jax.random.fold_in(jax.random.key(5), i), stacked)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    n_steps = n_chunks * K
    step_ms = dt / n_steps * 1e3
    images_per_sec = BATCH * n_steps / dt
    vs_baseline = BASELINE_STEP_MS / step_ms

    print(
        json.dumps(
            {
                "metric": "bbb_resnet20_cifar_train_step",
                "value": round(images_per_sec, 1),
                "unit": "images/sec (bs=128, step %.2f ms)" % step_ms,
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
