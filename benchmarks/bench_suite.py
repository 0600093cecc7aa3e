"""Benchmark suite: per-algorithm step time and MC-eval throughput on the
CIFAR ResNet-20 workload (the north-star metrics: "BDL optimizer step
time/particle + MC-eval samples/sec", BASELINE.md).

Timing methodology (see bench.py's module docstring): the tunneled axon
backend's ``block_until_ready`` is a no-op, so every timing folds many
steps into ONE dispatched scan, syncs by fetching a scalar, and nets out
the measured per-call tunnel latency.

Writes benchmarks/results.json; ``bench.py`` at the repo root remains the
single-line driver entry.

Usage: python benchmarks/bench_suite.py [--batch 128] [--scan 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even though the image's sitecustomize registers the
# axon plugin outside its control (a hung tunnel otherwise blocks even
# CPU-forced runs at jax.devices(); see tests/conftest.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import optax


def _setup():
    try:
        from beyond_deep_ensembles_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    try:
        from beyond_deep_ensembles_tpu.utils.perf import enable_fast_tpu_rng

        return enable_fast_tpu_rng()
    except Exception:
        return False


def tunnel_latency():
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0)))
        best = min(best, time.perf_counter() - t0)
    return best


def _timed(call, reps=3):
    call()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    return best


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
    from beyond_deep_ensembles_tpu.methods.laplace import laplace_method
    from beyond_deep_ensembles_tpu.methods.sngp import sngp_method
    from beyond_deep_ensembles_tpu.models.resnet import ResNet20
    from beyond_deep_ensembles_tpu.nn.base import Model
    from beyond_deep_ensembles_tpu.tree import tree_stack

    kind = {"bbb": "bbb", "rank1": "rank1"}.get(algo, "plain")
    if algo == "sngp":
        from beyond_deep_ensembles_tpu.experiments.cifar import SNGPResNet20

        model = Model(SNGPResNet20(classes=10))
    else:
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
    elif algo == "sngp":
        method = sngp_method(loss_fn, tx)
    elif algo == "laplace":
        # MAP training + post-hoc last-layer KRON fit (the reference's
        # fit_laplace phase over MAP checkpoints); the train timing is
        # the delegated MAP step, fit_s is timed separately in main()
        method = laplace_method(
            model, hessian="kron", regression=False, inner=map_method(loss_fn, tx)
        )
    else:
        raise ValueError(algo)

    # init on host CPU: eager ops through the tunnel cost minutes each
    from beyond_deep_ensembles_tpu.utils.perf import init_on_host

    def build_state():
        x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
        if particles:
            keys = jax.random.split(jax.random.key(0), particles)
            pairs = [model.init(k, x) for k in keys]
            return method.init(
                jax.random.key(1), tree_stack([p for p, _ in pairs]), pairs[0][1]
            )
        params, ms = model.init(jax.random.key(0), x)
        return method.init(jax.random.key(1), params, ms)

    return model, method, init_on_host(build_state), particles or 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan", type=int, default=64, help="steps folded per dispatch")
    ap.add_argument("--eval-samples", type=int, default=50)
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument(
        "--algos", default="map,mcd,bbb,rank1,swag,ivon,svgd,sngp,laplace"
    )
    args = ap.parse_args()

    fast_rng = _setup()
    lat = tunnel_latency()

    from beyond_deep_ensembles_tpu.methods import predict
    from beyond_deep_ensembles_tpu.parallel.multistep import make_multi_step

    K = args.scan
    stacked = (
        jax.random.normal(jax.random.key(2), (K, args.batch, 32, 32, 3)),
        jax.random.randint(jax.random.key(3), (K, args.batch), 0, 10),
    )
    results = {}
    for algo in args.algos.split(","):
        model, method, state, n_particles = build(algo, args.batch)
        multi = make_multi_step(method.update, K)
        holder = {"s": state, "i": 0}

        def run_train():
            holder["i"] += 1
            s, m = multi(holder["s"], jax.random.fold_in(jax.random.key(5), holder["i"]), stacked)
            holder["s"] = s
            return float(m["loss"])

        step_ms = max(_timed(run_train) - lat, 1e-9) / K * 1e3
        state = holder["s"]

        fit_s = None
        if algo == "sngp":
            # eval needs the epoch-boundary Cholesky covariance
            state = jax.jit(method.finalize_epoch)(state)
        elif algo == "laplace":
            # post-hoc GGN fit over the same K batches (the reference's
            # fit_laplace phase; laplace-torch la.fit + marglik sweep)
            flat_batches = [
                (stacked[0][i], stacked[1][i]) for i in range(K)
            ]
            # sync via scalar fetch (block_until_ready is a no-op here)
            fit_s = max(
                _timed(
                    lambda: float(method.fit(holder["s"], flat_batches).ll_mean.sum()),
                    reps=1,
                )
                - lat,
                1e-9,
            )
            state = method.fit(holder["s"], flat_batches)

        def apply_fn(params, model_state, key, x, n_samples=None):
            # multisample heads (SNGP) take the draw count in-forward
            kwargs = {} if n_samples is None else {"n_samples": n_samples}
            out, _, _ = model.apply(params, model_state, key, x, train=False, **kwargs)
            return jax.nn.log_softmax(out, axis=-1)

        nb = args.eval_batches

        @jax.jit
        def pred_many(s, xs, k):
            def body(c, inp):
                i, xb = inp
                out = predict(
                    method, s, apply_fn, xb, n_samples=args.eval_samples,
                    key=jax.random.fold_in(k, i),
                )
                return c + out.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), (jnp.arange(nb), xs))
            return out

        xs = jax.random.normal(jax.random.key(6), (nb, args.batch, 32, 32, 3))
        eval_s = max(
            _timed(lambda: float(pred_many(state, xs, jax.random.key(7)))) - lat, 1e-9
        )
        mc_samples_per_sec = nb * args.eval_samples * args.batch / eval_s

        results[algo] = {
            "step_ms": round(step_ms, 3),
            "step_ms_per_particle": round(step_ms / n_particles, 3),
            "mc_eval_samples_per_sec": round(mc_samples_per_sec, 1),
        }
        if fit_s is not None:
            results[algo]["fit_s"] = round(fit_s, 3)
            results[algo]["fit_batches"] = K
        print(f"{algo:8s} step {step_ms:7.2f} ms ({step_ms/n_particles:6.2f}/particle)  "
              f"mc-eval {mc_samples_per_sec:12.0f} samples/s"
              + (f"  fit {fit_s:.2f} s/{K} batches" if fit_s is not None else ""),
              flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    meta = {
        "device": str(jax.devices()[0]),
        "batch": args.batch,
        "scan_steps_per_dispatch": K,
        "prng_impl": "rbg" if fast_rng else "threefry2x32",
        "tunnel_latency_ms": round(lat * 1e3, 1),
        "sync": "host scalar fetch (block_until_ready is a no-op on this backend)",
        "note": "bbb/rank1 use mc_samples=2 (2 fwd/bwd per step; the bench.py "
        "headline is mc=1); map's mc-eval uses the identity-sample fast path "
        "(one forward reused across draws)",
    }
    # merge: keep full_scale_* and any other top-level sections intact,
    # and merge per-algorithm so a subset --algos run doesn't drop rows
    existing = {}
    try:
        with open(out_path) as f:
            existing = json.load(f)
    except Exception:
        pass
    merged = dict(existing.get("results", {}))
    merged.update(results)
    existing.update({"meta": meta, "results": merged})
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
