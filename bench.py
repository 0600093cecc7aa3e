"""Headline benchmark: BBB ResNet-20 (FRN + swish) CIFAR-10 training-step
throughput on one TPU chip, grounded by measured anchors.

This is the reference's hottest configuration (CIFAR-10: 50k images x 300
epochs at batch 128, SURVEY.md §6) and the core of the north-star metric
("BDL optimizer step time/particle"). The whole BBB step — local
reparameterization forward, KL collection, backward, Adam update — is one
jitted XLA program; K=256 steps are folded into one lax.scan dispatch
(parallel/multistep.py) over 256 DISTINCT minibatches.

TIMING METHODOLOGY (important on the tunneled axon backend):
``jax.block_until_ready`` does NOT synchronize through the tunnel — it
returns immediately and produced fictitious sub-ms steps in round 1/2
early benches. Every timing here fetches a scalar to the host (the only
true sync) and nets out the measured per-call tunnel latency; work is
folded into large single-dispatch scans so the latency correction is
small relative to the measured window.

vs_baseline divides the MEASURED reference step time by ours. The anchor
(benchmarks/torch_anchor.json, regenerate with benchmarks/torch_anchor.py)
is the live reference code timed on this host's CPU — the only hardware
the reference can use in this environment — and is labeled as such; no
invented accelerator constants. The JSON line also carries achieved
TFLOP/s and a chip-health matmul probe: the tunneled chip is multi-tenant
and sustained contention windows slow everything ~25x, so the probe
stamps whether a bad number is the chip or the code.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

BATCH = 128
SCAN_K = 256
TIMING_REPS = 4  # the tunneled chip is multi-tenant: take the best rep
V5E_BF16_PEAK_FLOPS = 197e12  # public TPU v5e spec: 197 TFLOP/s bf16
V5E_HBM_GBPS = 819e9  # public TPU v5e spec: 819 GB/s HBM bandwidth
ANCHOR_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "benchmarks", "torch_anchor.json"
)


def _enable_cache():
    try:
        from beyond_deep_ensembles_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass


_enable_cache()

try:
    from beyond_deep_ensembles_tpu.utils.perf import enable_fast_tpu_rng

    FAST_RNG = enable_fast_tpu_rng()
except Exception:
    FAST_RNG = False


def _init_on_host(build_state):
    """Run eager init code on the CPU backend, then transfer once.

    Unjitted init (flax module.init, optax tx.init) executes op by op;
    through the tunneled backend every tiny op costs a ~1-2 min
    compile+RPC round trip (measured r3), so a fresh-program bench burned
    its whole budget inside ``model.init``. On host CPU the same ops are
    milliseconds; one bulk device_put moves the result."""
    dev = jax.devices()[0]
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return build_state()
    with jax.default_device(cpu):
        state = build_state()
    return jax.device_put(state, dev)


def tunnel_latency():
    """Per-call dispatch+fetch latency of the tunneled backend (measured
    ~30 ms), subtracted from timing windows."""
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0)))
        best = min(best, time.perf_counter() - t0)
    return best


def _timed(call, reps=TIMING_REPS):
    """Best-of wall time of call() (must return a python float — the
    float conversion IS the sync)."""
    call()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_bbb_resnet20(lat, dtype=None, mc_samples=1, scan_k=None):
    from beyond_deep_ensembles_tpu.methods import GaussianPrior, bbb_method
    from beyond_deep_ensembles_tpu.methods.api import LossOutput
    from beyond_deep_ensembles_tpu.models.resnet import ResNet20
    from beyond_deep_ensembles_tpu.nn.base import Model
    from beyond_deep_ensembles_tpu.parallel.multistep import make_multi_step

    scan_k = scan_k or SCAN_K
    model = Model(
        ResNet20(
            classes=10,
            activation="swish",
            norm="frn",
            conv_kind="bbb",
            # default bf16 compute, fp32 params/accumulation
            dtype=dtype or jnp.bfloat16,
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
        mc_samples=mc_samples,
    )

    def build():
        x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
        params, model_state = model.init(jax.random.key(0), x)
        return method.init(jax.random.key(1), params, model_state)

    state = _init_on_host(build)

    # scan_k DISTINCT minibatches so the scanned step can never constant-fold.
    stacked = (
        jax.random.normal(jax.random.key(2), (scan_k, BATCH, 32, 32, 3)),
        jax.random.randint(jax.random.key(3), (scan_k, BATCH), 0, 10),
    )

    multi = make_multi_step(method.update, scan_k)

    holder = {"state": state, "i": 0}

    def run():
        holder["i"] += 1
        s, m = multi(holder["state"], jax.random.fold_in(jax.random.key(5), holder["i"]), stacked)
        holder["state"] = s
        return float(m["loss"])  # scalar fetch = the sync

    dt = max(_timed(run) - lat, 1e-9)
    step_s = dt / scan_k

    # XLA's own flop/byte counts. NOTE: cost_analysis does not multiply a
    # scan body by its trip count, so cost the SINGLE-step program.
    flops_per_step = bytes_per_step = None
    try:
        single = jax.jit(method.update)
        batch1 = (stacked[0][0], stacked[1][0])
        cost = single.lower(
            holder["state"], jax.random.key(4), batch1
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops", 0) > 0:
            flops_per_step = float(cost["flops"])
        if cost and cost.get("bytes accessed", 0) > 0:
            bytes_per_step = float(cost["bytes accessed"])
    except Exception:
        pass

    out = {
        "step_ms": step_s * 1e3,
        "images_per_sec": BATCH / step_s,
    }
    if flops_per_step:
        out["flops_per_step"] = flops_per_step
        out["achieved_tflops"] = flops_per_step / step_s / 1e12
        out["mfu_vs_v5e_bf16_peak"] = flops_per_step / step_s / V5E_BF16_PEAK_FLOPS
    if bytes_per_step:
        out["bytes_per_step"] = bytes_per_step
        out["hbm_gbps"] = bytes_per_step / step_s / 1e9
        out["hbm_util_vs_v5e_peak"] = bytes_per_step / step_s / V5E_HBM_GBPS
    return out


def bench_svgd_mlp(lat, particles: int = 20):
    """North-star SVGD config: 20 particles on the UCI MLP (50-50 hidden,
    reference experiments/uci/models.py), all particles in ONE vmapped
    step vs the reference's sequential per-particle passes."""
    from beyond_deep_ensembles_tpu.methods import svgd_method
    from beyond_deep_ensembles_tpu.methods.api import LossOutput
    from beyond_deep_ensembles_tpu.parallel.multistep import make_multi_step
    from beyond_deep_ensembles_tpu.tree import tree_stack

    d_in, h = 8, 50

    def forward(p, x):
        z = jax.nn.relu(x @ p["w1"] + p["b1"])
        z = jax.nn.relu(z @ p["w2"] + p["b2"])
        return z @ p["w3"] + p["b3"]

    def loss_fn(params, model_state, key, batch):
        x, y = batch
        return LossOutput(loss=jnp.mean((forward(params, x) - y) ** 2))

    def init_one(key):
        ks = jax.random.split(key, 3)
        return {
            "w1": jax.random.normal(ks[0], (d_in, h)) * 0.1,
            "b1": jnp.zeros(h),
            "w2": jax.random.normal(ks[1], (h, h)) * 0.1,
            "b2": jnp.zeros(h),
            "w3": jax.random.normal(ks[2], (h, 1)) * 0.1,
            "b3": jnp.zeros(1),
        }

    method = svgd_method(
        loss_fn, optax.adam(1e-3), particle_count=particles, dataset_size=512, l2_reg=1e-2
    )
    state = _init_on_host(lambda: method.init(
        jax.random.key(1),
        tree_stack([init_one(k) for k in jax.random.split(jax.random.key(0), particles)]),
        {},
    ))
    # the MLP step is tiny: a long scan keeps the window >> tunnel latency
    K = 4096
    batches = (
        jax.random.normal(jax.random.key(2), (K, 128, d_in)),
        jax.random.normal(jax.random.key(3), (K, 128, 1)),
    )
    multi = make_multi_step(method.update, K)
    holder = {"state": state, "i": 0}

    def run():
        holder["i"] += 1
        s, m = multi(holder["state"], jax.random.fold_in(jax.random.key(5), holder["i"]), batches)
        holder["state"] = s
        return float(m["loss"])

    dt = max(_timed(run) - lat, 1e-9)
    step_ms = dt / K * 1e3
    return {"step_ms": step_ms, "step_ms_per_particle": step_ms / particles}


def bench_mc_eval(lat, samples: int = 50):
    """Posterior-predictive throughput: MC-dropout-style sampled forwards
    on ResNet-20, vmapped over the sample axis."""
    from beyond_deep_ensembles_tpu.methods import map_method, predict
    from beyond_deep_ensembles_tpu.methods.api import LossOutput
    from beyond_deep_ensembles_tpu.models.resnet import ResNet20
    from beyond_deep_ensembles_tpu.nn.base import Model

    model = Model(
        ResNet20(classes=10, activation="swish", norm="frn", dropout_p=0.1,
                 dtype=jnp.bfloat16)
    )

    def loss_fn(params, model_state, key, batch):
        x, y = batch
        out, kl, new_state = model.apply(params, model_state, key, x, train=True)
        return LossOutput(loss=jnp.mean(out), kl=kl, model_state=new_state)

    method = map_method(loss_fn, optax.sgd(0.1))

    def build():
        x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
        params, ms = model.init(jax.random.key(0), x)
        return method.init(jax.random.key(1), params, ms)

    state = _init_on_host(build)

    def apply_fn(params, model_state, key, xb):
        out, _, _ = model.apply(params, model_state, key, xb, train=False)
        return jax.nn.log_softmax(out, axis=-1)

    n_batches = 16  # enlarge the window well past the tunnel latency

    @jax.jit
    def pred_many(s, xs, k):
        def body(c, inp):
            i, xb = inp
            out = predict(method, s, apply_fn, xb, n_samples=samples, key=jax.random.fold_in(k, i))
            return c + out.sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), (jnp.arange(n_batches), xs))
        return out

    xs = jax.random.normal(jax.random.key(2), (n_batches, BATCH, 32, 32, 3))

    dt = max(_timed(lambda: float(pred_many(state, xs, jax.random.key(4)))) - lat, 1e-9)
    return {"mc_eval_samples_per_sec": n_batches * samples * BATCH / dt}


def chip_health_probe(lat):
    """Achieved bf16 TFLOP/s on a chained-4096^3-matmul scan (scalar
    fetch sync). Healthy v5e measures ~110 TF/s (~56% peak; the chain is
    serially dependent); sustained multi-tenant contention windows show
    a fraction of that — this stamps which world the other numbers live in."""
    n, k = 4096, 64
    a = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            return (x @ b) * (1.0 / n), None
        out, _ = jax.lax.scan(body, a, None, length=k)
        return jnp.float32(out.sum())

    dt = max(_timed(lambda: float(chain(a, b))) - lat, 1e-9)
    tflops = 2 * n**3 * k / dt / 1e12
    return {
        "matmul_tflops": round(tflops, 1),
        "fraction_of_peak": round(tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 3),
    }


def load_anchor():
    try:
        with open(ANCHOR_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def _stage(msg):
    import sys

    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    # Budget guard: cold compiles through the tunnel cost minutes each;
    # if we're near the driver's window, skip the optional table rows
    # rather than lose the headline. Warm-cache runs finish in ~3-4 min.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.perf_counter()

    def over_budget():
        return time.perf_counter() - t_start > budget_s * 0.55

    lat = tunnel_latency()
    _stage(f"latency {lat*1e3:.1f} ms")
    health = chip_health_probe(lat)
    _stage(f"health {health}")
    bbb = bench_bbb_resnet20(lat)
    _stage(f"bbb mc1 {bbb.get('step_ms'):.2f} ms")
    # Live big-backbone probe: one reps=1 bert_map measurement through
    # the real engine builder so every round's BENCH JSON carries a
    # number measured IN THIS RUN (delta vs the committed
    # benchmarks/results.json row stamped alongside). Runs RIGHT AFTER
    # the headline: under a degraded tunnel the budget guard must cut
    # the long-recorded mc2/fp32 table rows, not this round artifact
    # (a 15-min run measured the probe being skipped when it sat last).
    bb_live = None
    if not over_budget():
        try:
            import sys as _sys

            _sys.path.insert(
                0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks")
            )
            import big_backbones as _bb

            bb_live = _bb.run_workload("bert_map", lat, reps=1)
            _stage(
                f"big_backbones_live bert_map {bb_live['step_ms']} ms/step, "
                f"MFU {bb_live.get('mfu_vs_v5e_bf16_peak', '?')}"
            )
        except Exception as e:
            _stage(f"big_backbones_live failed: {e!r}")
    # Reconciled per-config table (VERDICT r2 weak #1): the headline is
    # mc=1 bf16; every experiment default uses mc=2 (cifar.py bbb_mc_samples)
    # and the full-scale artifact ran mc=2 fp32 + augmentation. One table,
    # one methodology, so the rows multiply into each other.
    # scan_k=32 keeps the mc=2 rows' compile small (the tunneled backend
    # compiles big conv scans in minutes); the 32-step window is still
    # ~10x the tunnel latency for these >6 ms steps.
    table = {"mc1_bf16": bbb}
    try:
        if not over_budget():
            table["mc2_bf16"] = bench_bbb_resnet20(
                lat, dtype=jnp.bfloat16, mc_samples=2, scan_k=32
            )
            _stage(f"bbb mc2 bf16 {table['mc2_bf16']['step_ms']:.2f} ms")
        if not over_budget():
            table["mc2_fp32"] = bench_bbb_resnet20(
                lat, dtype=jnp.float32, mc_samples=2, scan_k=32
            )
            _stage(f"bbb mc2 fp32 {table['mc2_fp32']['step_ms']:.2f} ms")
    except Exception as e:
        _stage(f"table failed: {e!r}")
    # the optional rows respect the budget too — a cold-cache run must
    # never trade the headline for secondary numbers
    svgd = mc = None
    if not over_budget():
        svgd = bench_svgd_mlp(lat)
        _stage("svgd done")
    if not over_budget():
        mc = bench_mc_eval(lat)
        _stage("mc_eval done")
    anchor = load_anchor()

    result = {
        "metric": "bbb_resnet20_cifar_train_step",
        "value": round(bbb["images_per_sec"], 1),
        "unit": "images/sec (bs=%d, step %.2f ms)" % (BATCH, bbb["step_ms"]),
    }
    if anchor:
        result["vs_baseline"] = round(anchor["step_ms"] / bbb["step_ms"], 2)
        result["baseline_anchor"] = {
            "kind": anchor["kind"],
            "hardware": anchor["hardware"],
            "step_ms": anchor["step_ms"],
            "caveat": "reference measured on host CPU (its only option here), not an accelerator",
        }
    else:
        result["vs_baseline"] = None

    extra = {"tunnel_latency_ms": round(lat * 1e3, 1)}
    if svgd is not None:
        extra["svgd20_mlp_step_ms_per_particle"] = round(
            svgd["step_ms_per_particle"], 4
        )
    if mc is not None:
        extra["mc_eval_samples_per_sec"] = round(mc["mc_eval_samples_per_sec"], 1)
    if "achieved_tflops" in bbb:
        extra["bbb_achieved_tflops"] = round(bbb["achieved_tflops"], 2)
        extra["bbb_mfu_vs_v5e_bf16_peak"] = round(bbb["mfu_vs_v5e_bf16_peak"], 4)
        extra["bbb_flops_per_step"] = bbb["flops_per_step"]
    if "hbm_gbps" in bbb:
        extra["bbb_hbm_gbps"] = round(bbb["hbm_gbps"], 1)
        extra["bbb_hbm_util_vs_v5e_peak"] = round(bbb["hbm_util_vs_v5e_peak"], 4)
        # cost_analysis "bytes accessed" counts logical buffer accesses
        # BEFORE fusion elides them, so implied GB/s can exceed the
        # physical peak (notably for fp32 rows); it is an upper bound on
        # true traffic, useful for cross-config ratios, not absolutes.
        extra["hbm_note"] = "bytes from XLA cost analysis (pre-fusion upper bound)"
    extra["chip_health"] = health
    extra["prng_impl"] = "rbg" if FAST_RNG else "threefry2x32"

    # per-config rows + full-scale-epoch reconciliation (390 steps/epoch
    # at bs128 over 50k images; augmentation runs inside the same step)
    rows = {}
    for name, r in table.items():
        rows[name] = {
            "step_ms": round(r["step_ms"], 2),
            "hbm_gbps": round(r.get("hbm_gbps", 0.0), 1),
            "bytes_per_step_mb": round(r.get("bytes_per_step", 0.0) / 1e6, 1),
        }
    if "mc2_fp32" in table:
        rows["projected_epoch_s_mc2_fp32"] = round(
            390 * table["mc2_fp32"]["step_ms"] / 1e3, 2
        )
    extra["bbb_table"] = rows

    # Stamp the recorded full-scale artifacts (benchmarks/full_scale.py
    # runs; regenerate on-device) so the reconciliation is one JSON line:
    # projected_epoch (above) vs measured epoch (below).
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "benchmarks", "results.json")
        ) as f:
            recorded = json.load(f)
        fs = {}
        for k in ("full_scale_fp32", "full_scale_bf16", "full_scale_bf16_noaug",
                  "full_scale_fp32_hard", "full_scale_svgd5_fp32"):
            if k in recorded and "epoch_seconds" in recorded[k]:
                fs[k + "_epoch_s"] = recorded[k]["epoch_seconds"]
        if fs:
            extra["full_scale_recorded"] = fs
        # big-backbone rows (benchmarks/big_backbones.py: DistilBERT-512 /
        # ResNet-50@448 / DenseNet-121 via the real wilds_task engine):
        # step time + MFU + roofline verdict per reference-scale workload
        bb = recorded.get("big_backbones", {})
        if bb_live is not None:
            live = {
                f: bb_live.get(f)
                for f in (
                    "step_ms", "images_per_sec", "achieved_tflops",
                    "mfu_vs_v5e_bf16_peak",
                )
                if bb_live.get(f) is not None
            }
            live["workload"] = "bert_map"
            rec_row = bb.get("bert_map", {}) if isinstance(bb, dict) else {}
            if rec_row.get("step_ms"):
                live["recorded_step_ms"] = rec_row["step_ms"]
                live["live_vs_recorded"] = round(
                    rec_row["step_ms"] / bb_live["step_ms"], 3
                )
            extra["big_backbones_live"] = live
        if bb:
            extra["big_backbones"] = {
                k: {
                    f: v.get(f)
                    for f in (
                        "step_ms", "images_per_sec", "achieved_tflops",
                        "mfu_vs_v5e_bf16_peak", "projected_full_train_h",
                    )
                    if v.get(f) is not None
                }
                | ({"roofline": v["roofline"]["verdict"]} if "roofline" in v else {})
                for k, v in bb.items()
                if k != "meta" and isinstance(v, dict) and "step_ms" in v
            }
        # posterior-predictive MC-eval throughput (S=10) for the same
        # backbones (benchmarks/big_backbones.py --mode eval)
        bbe = recorded.get("big_backbones_eval", {})
        if bbe:
            extra["big_backbones_eval"] = {
                k: {
                    f: v.get(f)
                    for f in (
                        "eval_ms_per_batch", "posterior_samples_per_sec",
                        "projected_test_eval_s",
                    )
                    if v.get(f) is not None
                }
                for k, v in bbe.items()
                if k != "meta" and isinstance(v, dict)
                and "eval_ms_per_batch" in v
            }
    except Exception:
        pass
    if bb_live is not None and "big_backbones_live" not in extra:
        # results.json unreadable: still report the live measurement
        extra["big_backbones_live"] = {
            "workload": "bert_map",
            "step_ms": bb_live.get("step_ms"),
            "mfu_vs_v5e_bf16_peak": bb_live.get("mfu_vs_v5e_bf16_peak"),
        }
    result["extra"] = extra

    print(json.dumps(result))


if __name__ == "__main__":
    main()
