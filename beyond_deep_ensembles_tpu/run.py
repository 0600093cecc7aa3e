"""Experiment CLI — the cw2 ClusterWork replacement.

Reference entry protocol: ``python3 {task}.py {task}.yaml`` with cw2
multi-document YAML sweeps and per-repetition seeding
(experiments/cifar/cifar.py:250-252, SURVEY.md §5 config system).

Here: ``python -m beyond_deep_ensembles_tpu.run <task> <sweep.yaml>
[--name VARIANT] [--rep K] [--out results/] [--phase PHASE]``. Tasks: uci,
cifar, and the seven WILDS tasks. Each variant x repetition trains,
evaluates and writes metrics JSONL + checkpoints under
``<out>/<variant>/rep_<k>/``.

Downstream phases (reference per-task ``fit_laplace.py`` /
``eval_ensembles.py`` scripts, SURVEY.md §2.5) are first-class commands
reading the ``{model}_final`` checkpoints a train phase wrote:

  --phase fit_laplace   post-hoc Laplace per repetition
  --phase multix        deep ensemble over the variant's repetitions
                        (``--leave-out K`` for the leave-one-out protocol)
  --phase drop_rates    dropout-rate sweep over a saved MCD checkpoint
                        (reference test_drop_rates.py)
  --phase eval          re-evaluate a saved checkpoint without training
                        (reference eval_only.py)
"""
from __future__ import annotations

import argparse
import json
import os

from .utils.config import load_sweep
from .utils.logging import RunLogger

WILDS_TASKS = (
    "camelyon17",
    "iwildcam",
    "rxrx1",
    "fmow",
    "poverty",
    "civilcomments",
    "amazon",
)


def run_task(task: str, params: dict, log) -> dict:
    if task == "uci":
        from .experiments import uci

        return uci.run(params, log=log.info)
    if task == "cifar":
        from .experiments import cifar

        return cifar.run_single(params, log=log.info)
    if task in WILDS_TASKS:
        from .experiments import wilds_task

        return wilds_task.run_single(task, params, log=log.info)
    raise ValueError(f"unknown task {task!r}")


def run_phase(task: str, phase: str, params: dict, run_dirs, log, leave_out=None):
    """Dispatch a checkpoint-driven downstream phase. ``run_dirs`` is the
    single rep dir (fit_laplace) or the variant's rep dirs (multix)."""
    if task == "cifar":
        from .experiments import cifar

        if phase == "fit_laplace":
            return cifar.fit_laplace_phase(params, run_dirs[0], log=log.info)
        if phase == "multix":
            return cifar.multix_phase(
                params, run_dirs, leave_out=leave_out, log=log.info
            )
    if task in WILDS_TASKS:
        from .experiments import wilds_task

        if phase == "fit_laplace":
            return wilds_task.fit_laplace_phase(task, params, run_dirs[0], log=log.info)
        if phase == "drop_rates":
            return wilds_task.sweep_drop_rates_phase(
                task, params, run_dirs[0], log=log.info
            )
        if phase == "eval":
            return wilds_task.eval_only_phase(task, params, run_dirs[0], log=log.info)
        if phase == "multix":
            return wilds_task.multix_phase(
                task, params, run_dirs, leave_out=leave_out, log=log.info
            )
    raise ValueError(f"phase {phase!r} not supported for task {task!r}")


def _enable_cache():
    try:
        from beyond_deep_ensembles_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    try:
        from beyond_deep_ensembles_tpu.utils.perf import enable_fast_tpu_rng

        enable_fast_tpu_rng()
    except Exception:
        pass


_enable_cache()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("task")
    parser.add_argument("sweep", help="multi-document YAML sweep file")
    parser.add_argument("--name", default=None, help="run only this variant")
    parser.add_argument("--rep", type=int, default=None, help="run only this repetition")
    parser.add_argument("--out", default="results")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument(
        "--phase",
        default="train",
        choices=("train", "fit_laplace", "multix", "drop_rates", "eval"),
        help="train, or a checkpoint-driven downstream phase",
    )
    parser.add_argument(
        "--leave-out",
        type=int,
        default=None,
        help="multix: exclude this repetition (leave-one-out protocol)",
    )
    args = parser.parse_args(argv)

    for spec in load_sweep(args.sweep, name=args.name):
        reps = range(spec["repetitions"]) if args.rep is None else [args.rep]
        variant_dir = os.path.join(args.out, f"{spec['name']}_{spec['variant']}")

        if args.phase == "multix":
            params = dict(spec["params"])
            run_dirs = [
                os.path.join(variant_dir, f"rep_{r}") for r in range(spec["repetitions"])
            ]
            tag = "multix" if args.leave_out is None else f"multix_lo{args.leave_out}"
            log = RunLogger(
                os.path.join(variant_dir, tag),
                name=f"{spec['name']}/{tag}",
                use_wandb=args.wandb,
                config=params,
            )
            results = run_phase(
                args.task, "multix", params, run_dirs, log, leave_out=args.leave_out
            )
            log.metrics(results)
            log.info(f"results: {json.dumps(results, default=float)}")
            log.close()
            continue

        for rep in reps:
            params = {**spec["params"], "seed": rep + spec["params"].get("seed_offset", 0)}
            out_dir = os.path.join(variant_dir, f"rep_{rep}")
            if args.phase in ("fit_laplace", "drop_rates", "eval"):
                log = RunLogger(
                    os.path.join(out_dir, args.phase),
                    name=f"{spec['name']}/r{rep}/{args.phase}",
                    use_wandb=args.wandb,
                    config=params,
                )
                results = run_phase(args.task, args.phase, params, [out_dir], log)
            else:
                params.setdefault("checkpoint_dir", out_dir)
                log = RunLogger(out_dir, name=f"{spec['name']}/r{rep}", use_wandb=args.wandb, config=params)
                log.info(f"config: {json.dumps(params, default=str)[:500]}")
                results = run_task(args.task, params, log)
            log.metrics(results)
            log.info(f"results: {json.dumps(results, default=float)}")
            log.close()


if __name__ == "__main__":
    main()
