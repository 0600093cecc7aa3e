"""Benchmark suite: per-algorithm step time and MC-eval throughput on the
CIFAR ResNet-20 workload (the north-star metrics: "BDL optimizer step
time/particle + MC-eval samples/sec", BASELINE.md).

Writes benchmarks/results.json; ``bench.py`` at the repo root remains the
single-line driver entry.

Usage: python benchmarks/bench_suite.py [--batch 128] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def build(algo: str, batch: int, dtype=jnp.bfloat16):
    from beyond_deep_ensembles_tpu.methods import (
        GaussianPrior,
        bbb_method,
        ivon_method,
        map_method,
        svgd_method,
        swag_method,
    )
    from beyond_deep_ensembles_tpu.methods.api import LossOutput
    from beyond_deep_ensembles_tpu.models.resnet import ResNet20
    from beyond_deep_ensembles_tpu.nn.base import Model
    from beyond_deep_ensembles_tpu.tree import tree_stack

    kind = {"bbb": "bbb", "rank1": "rank1"}.get(algo, "plain")
    model = Model(
        ResNet20(classes=10, activation="swish", norm="frn", conv_kind=kind, dtype=dtype,
                 components=4 if algo == "rank1" else 1,
                 dropout_p=0.1 if algo == "mcd" else None)
    )

    def loss_fn(params, model_state, key, b, component=None):
        x, y = b
        kw = {} if component is None else {"component": component}
        out, kl, new_state = model.apply(params, model_state, key, x, train=True, **kw)
        logp = jax.nn.log_softmax(out)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        return LossOutput(loss=loss, kl=kl, model_state=new_state)

    prior = GaussianPrior(0.0, 1.0)
    tx = optax.sgd(0.05, momentum=0.9)
    particles = None
    if algo in ("map", "mcd"):
        method = map_method(loss_fn, tx)
    elif algo == "bbb":
        method = bbb_method(loss_fn, tx, prior, 50_000, mc_samples=2, kl_rescaling=0.2)
    elif algo == "rank1":
        method = bbb_method(loss_fn, tx, prior, 50_000, mc_samples=2, components=4)
    elif algo == "swag":
        method = swag_method(loss_fn, tx, update_interval=10, start_epoch=0)
    elif algo == "ivon":
        method = ivon_method(loss_fn, lr=1e-4, prior_prec=50, dataset_size=50_000, mc_samples=2)
    elif algo == "svgd":
        particles = 5
        method = svgd_method(loss_fn, tx, particle_count=5, dataset_size=50_000, l2_reg=3e-4)
    else:
        raise ValueError(algo)

    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    if particles:
        keys = jax.random.split(jax.random.key(0), particles)
        pairs = [model.init(k, x) for k in keys]
        state = method.init(jax.random.key(1), tree_stack([p for p, _ in pairs]), pairs[0][1])
    else:
        params, ms = model.init(jax.random.key(0), x)
        state = method.init(jax.random.key(1), params, ms)
    return model, method, state, particles or 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--eval-samples", type=int, default=50)
    ap.add_argument("--algos", default="map,mcd,bbb,rank1,swag,ivon,svgd")
    args = ap.parse_args()

    from beyond_deep_ensembles_tpu.methods import predict

    batch = (
        jax.random.normal(jax.random.key(2), (args.batch, 32, 32, 3)),
        jax.random.randint(jax.random.key(3), (args.batch,), 0, 10),
    )
    results = {}
    for algo in args.algos.split(","):
        model, method, state, n_particles = build(algo, args.batch)
        update = jax.jit(method.update)
        state, m = update(state, jax.random.key(4), batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = update(state, jax.random.fold_in(jax.random.key(5), i), batch)
        jax.block_until_ready(m["loss"])
        step_ms = (time.perf_counter() - t0) / args.steps * 1e3

        def apply_fn(params, model_state, key, x):
            out, _, _ = model.apply(params, model_state, key, x, train=False)
            return jax.nn.log_softmax(out, axis=-1)

        pred = jax.jit(
            lambda s, xb, k: predict(method, s, apply_fn, xb, n_samples=args.eval_samples, key=k)
        )
        out = pred(state, batch[0], jax.random.key(6))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            out = pred(state, batch[0], jax.random.fold_in(jax.random.key(7), i))
        jax.block_until_ready(out)
        eval_s = (time.perf_counter() - t0) / reps
        mc_samples_per_sec = args.eval_samples * args.batch / eval_s

        results[algo] = {
            "step_ms": round(step_ms, 3),
            "step_ms_per_particle": round(step_ms / n_particles, 3),
            "mc_eval_samples_per_sec": round(mc_samples_per_sec, 1),
        }
        print(f"{algo:8s} step {step_ms:7.2f} ms ({step_ms/n_particles:6.2f}/particle)  "
              f"mc-eval {mc_samples_per_sec:12.0f} samples/s", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    meta = {"device": str(jax.devices()[0]), "batch": args.batch}
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "results": results}, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
