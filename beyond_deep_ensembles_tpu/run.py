"""Experiment CLI — the cw2 ClusterWork replacement.

Reference entry protocol: ``python3 {task}.py {task}.yaml`` with cw2
multi-document YAML sweeps and per-repetition seeding
(experiments/cifar/cifar.py:250-252, SURVEY.md §5 config system).

Here: ``python -m beyond_deep_ensembles_tpu.run <task> <sweep.yaml>
[--name VARIANT] [--rep K] [--out results/]``. Tasks: uci, cifar, and the
seven WILDS tasks. Each variant x repetition trains, evaluates and writes
metrics JSONL + checkpoints under ``<out>/<variant>/rep_<k>/``.
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


def _enable_cache():
    try:
        from beyond_deep_ensembles_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
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
    args = parser.parse_args(argv)

    for spec in load_sweep(args.sweep, name=args.name):
        reps = range(spec["repetitions"]) if args.rep is None else [args.rep]
        for rep in reps:
            params = {**spec["params"], "seed": rep + spec["params"].get("seed_offset", 0)}
            out_dir = os.path.join(
                args.out, f"{spec['name']}_{spec['variant']}", f"rep_{rep}"
            )
            log = RunLogger(out_dir, name=f"{spec['name']}/r{rep}", use_wandb=args.wandb, config=params)
            log.info(f"config: {json.dumps(params, default=str)[:500]}")
            results = run_task(args.task, params, log)
            log.metrics(results)
            log.info(f"results: {json.dumps(results, default=float)}")
            log.close()


if __name__ == "__main__":
    main()
