"""Full-scale CIFAR training epoch measurement (the r2 artifact's
workload, now a reusable script): ResNet-20-FRN-swish, 50k images x
bs128, device-side augmentation, whole-epoch device-resident scan
(parallel/multistep.py make_epoch_runner).

--algo bbb  (default): variational convs, mc_samples per step.
--algo svgd: n particles trained SIMULTANEOUSLY in one vmapped program
  (kernel/phi over all particles per step) — the reference trains SVGD
  particles in a sequential Python loop (src/algos/svgd.py:67), so
  particle count multiplies its wall-clock but largely rides the same
  dispatch here.

Timing: one host scalar fetch per epoch (block_until_ready is a no-op on
the tunneled backend); the first epoch is discarded (compile).

Usage: python benchmarks/full_scale.py [--dtype fp32|bf16] [--epochs 4]
Writes/updates the "full_scale" entry in benchmarks/results.json.
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
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", choices=("bbb", "svgd"), default="bbb")
    ap.add_argument("--particles", type=int, default=5, help="svgd particles (reference cifar.yaml:227 uses 5)")
    ap.add_argument("--dtype", choices=("fp32", "bf16"), default="fp32")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--mc", type=int, default=2)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument(
        "--hard",
        action="store_true",
        help="non-separable synthetic (overlapping classes + 10%% label "
        "noise, BDE_SYNTH_HARD=1) and a held-out posterior-predictive "
        "eval — convergence evidence, not just throughput",
    )
    ap.add_argument("--eval-samples", type=int, default=20)
    ap.add_argument(
        "--no-augment",
        action="store_true",
        help="skip the bulk crop+flip pass (A/B attribution of the gap "
        "between pure step time x steps and the measured epoch)",
    )
    args = ap.parse_args()
    if args.hard:
        os.environ["BDE_SYNTH_HARD"] = "1"

    from beyond_deep_ensembles_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from beyond_deep_ensembles_tpu.utils.perf import enable_fast_tpu_rng

    enable_fast_tpu_rng()

    from beyond_deep_ensembles_tpu.data import cifar as cifar_data
    from beyond_deep_ensembles_tpu.methods import GaussianPrior, bbb_method, svgd_method
    from beyond_deep_ensembles_tpu.methods.api import LossOutput
    from beyond_deep_ensembles_tpu.models.resnet import ResNet20
    from beyond_deep_ensembles_tpu.nn.base import Model
    from beyond_deep_ensembles_tpu.parallel.multistep import make_epoch_runner
    from beyond_deep_ensembles_tpu.tree import tree_stack

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    conv_kind = "bbb" if args.algo == "bbb" else "plain"
    model = Model(
        ResNet20(
            classes=10, activation="swish", norm="frn", conv_kind=conv_kind, dtype=dtype
        )
    )

    def loss_fn(params, model_state, key, batch):
        x, y = batch
        out, kl, new_state = model.apply(params, model_state, key, x, train=True)
        logp = jax.nn.log_softmax(out)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        return LossOutput(loss=loss, kl=kl, model_state=new_state)

    if args.algo == "bbb":
        method = bbb_method(
            loss_fn,
            optax.adam(3e-4),
            GaussianPrior(0.0, 1.0),
            dataset_size=args.n,
            mc_samples=args.mc,
            kl_rescaling=0.2,
        )
    else:
        # reference cifar.yaml:215-227 svgd block: SGD momentum 0.9
        # nesterov + base-optimizer weight_decay 3e-4, reg_scale 3e-4,
        # 5 particles
        method = svgd_method(
            loss_fn,
            optax.chain(
                optax.add_decayed_weights(3e-4),
                optax.sgd(0.05, momentum=0.9, nesterov=True),
            ),
            particle_count=args.particles,
            dataset_size=args.n,
            l2_reg=3e-4,
        )

    def stage(msg):
        print(f"[fs {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    stage("loading data")
    x_np, y_np = cifar_data.load_cifar10(train=True, subsample=args.n)
    stage("uploading data")
    x = jnp.asarray(x_np[: args.n])
    y = jnp.asarray(y_np[: args.n])
    jax.block_until_ready((x, y))
    stage("init")

    # init on host CPU: eager ops through the tunnel cost minutes each
    from beyond_deep_ensembles_tpu.utils.perf import init_on_host

    def build_state():
        if args.algo == "svgd":
            keys = jax.random.split(jax.random.key(0), args.particles)
            inits = [model.init(k, jnp.zeros((2, 32, 32, 3))) for k in keys]
            params = tree_stack([p for p, _ in inits])
            ms = inits[0][1]
        else:
            params, ms = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)))
        return method.init(jax.random.key(1), params, ms)

    state = init_on_host(build_state)

    # augmentation as ONE bulk pass per epoch (epoch_transform), not
    # per-step ops in the loss — measured 4-6 ms/step cheaper (r3)
    runner = make_epoch_runner(
        method.update,
        x.shape[0],
        args.batch,
        epoch_transform=None
        if args.no_augment
        else (lambda k, d: (cifar_data.augment(k, d[0]), d[1])),
    )
    key = jax.random.key(7)
    stage("first epoch (compiles)")

    losses, times = [], []
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        state, metrics = runner(state, jax.random.fold_in(key, epoch), (x, y))
        loss = float(metrics["loss"])  # the sync
        dt = time.perf_counter() - t0
        losses.append(round(loss, 4))
        if epoch > 0:  # first epoch pays the compile
            times.append(dt)
        print(f"epoch {epoch}: {dt:.2f} s  loss {loss:.4f}", flush=True)

    eval_block = None
    if args.hard:
        # Held-out posterior-predictive eval: on the hard synthetic the
        # Bayes error is nonzero, so accuracy < 1 and NLL/ECE are
        # informative (VERDICT r2: the separable stand-in proved only
        # throughput). One jitted batch-eval, BMA over posterior draws.
        from beyond_deep_ensembles_tpu.evals.calibration import (
            CalibrationResults,
        )
        from beyond_deep_ensembles_tpu.evals.classification import (
            bayesian_model_average,
        )
        from beyond_deep_ensembles_tpu.methods import predict as mc_predict

        stage("held-out eval")
        xt_np, yt_np = cifar_data.load_cifar10(train=False, subsample=2048)
        xt, yt = jnp.asarray(xt_np[:2048]), jnp.asarray(yt_np[:2048])

        @jax.jit
        def eval_batch(state, xb, k):
            def apply_eval(params, ms, kk, xx):
                out, _, _ = model.apply(params, ms, kk, xx, train=False)
                return jax.nn.log_softmax(out)

            draws = mc_predict(
                method, state, apply_eval, xb, n_samples=args.eval_samples, key=k
            )
            return bayesian_model_average(draws)

        lm = []
        ek = jax.random.key(99)
        for i in range(0, xt.shape[0], 512):
            lm.append(
                np.asarray(
                    eval_batch(state, xt[i : i + 512], jax.random.fold_in(ek, i))
                )
            )
        log_marginal = np.concatenate(lm)
        pred = log_marginal.argmax(-1)
        acc = float((pred == np.asarray(yt)).mean())
        nll = float(-log_marginal[np.arange(len(yt)), np.asarray(yt)].mean())
        conf = np.exp(log_marginal.max(-1))
        cal = CalibrationResults.create(
            10, jnp.asarray(pred == np.asarray(yt)), jnp.asarray(conf)
        )
        eval_block = {
            "n_test": int(xt.shape[0]),
            "posterior_samples": args.eval_samples,
            "accuracy": round(acc, 4),
            "nll": round(nll, 4),
            "ece": round(float(cal.ece), 4),
        }
        stage(f"eval acc={acc:.4f} nll={nll:.4f} ece={float(cal.ece):.4f}")

    epoch_s = min(times) if times else float("nan")
    steps = x.shape[0] // args.batch
    desc = (
        f"mc_samples={args.mc}"
        if args.algo == "bbb"
        else f"{args.particles} particles, ALL vmapped per step"
    )
    aug_desc = (
        "no augmentation (A/B attribution)"
        if args.no_augment
        else "device-side augmentation"
    )
    entry = {
        "workload": (
            f"CIFAR-scale {args.algo.upper()} ResNet-20-FRN-swish, {args.n} images "
            f"x bs{args.batch}, {desc}, {args.dtype}, {aug_desc}, "
            "whole-epoch device-resident scan"
        ),
        "hardware": str(jax.devices()[0]),
        "sync": "host scalar fetch per epoch",
        "epochs_timed": len(times),
        "epoch_seconds": round(epoch_s, 2),
        "step_ms_implied": round(epoch_s / steps * 1e3, 2),
        "train_loss": losses,
    }
    if args.hard:
        entry["workload"] += " [HARD synthetic: overlapping classes + 10% label noise]"
        entry["held_out_eval"] = eval_block
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    algo_tag = "" if args.algo == "bbb" else f"_svgd{args.particles}"
    key_name = (
        f"full_scale{algo_tag}_{args.dtype}"
        + ("_noaug" if args.no_augment else "")
        + ("_hard" if args.hard else "")
    )
    data[key_name] = entry
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
