"""Measure the REFERENCE implementation's BBB ResNet-20 train step on this
host's CPU and record it as the benchmark anchor.

The round-1 bench compared against an invented "~40 ms on A100" constant;
that is unfalsifiable in this environment. This script runs the actual
reference code (/root/reference: src/algos/bbb.py BBBOptimizer driving the
variational src/architectures/resnet.py ResNet20, the exact
experiments/cifar/models.py build_bbb configuration) on the only hardware
the reference can use here — the host CPU — and caches the measured step
time in benchmarks/torch_anchor.json. bench.py reads the cache and labels
the comparison accordingly.

Usage: python benchmarks/torch_anchor.py [--batch 128] [--steps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torch_anchor.json")


def measure(batch: int, steps: int) -> dict:
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    from src.algos.bbb import BBBOptimizer, GaussianPrior
    from src.architectures.resnet import ResNet20

    torch.manual_seed(0)
    prior = GaussianPrior(0, 1.0)
    # experiments/cifar/models.py:61-65 build_bbb + _get_model(variational=True)
    model = ResNet20(32, 3, 10, "swish", "frn", variational=True, prior=prior)
    base = torch.optim.SGD(model.parameters(), lr=0.05, momentum=0.9)
    opt = BBBOptimizer(
        model.parameters(), base, prior=prior, dataset_size=50_000, mc_samples=1
    )

    x = torch.randn(batch, 3, 32, 32)
    y = torch.randint(0, 10, (batch,))

    def fwd():
        return torch.nn.functional.cross_entropy(model(x), y)

    opt.step(fwd, lambda l: l.backward())  # warmup (allocator, autograd graph)
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.step(fwd, lambda l: l.backward())
    dt = time.perf_counter() - t0

    return {
        "kind": "reference PyTorch BBB ResNet-20 train step",
        "hardware": f"host CPU ({os.cpu_count()} core(s)), torch {torch.__version__}",
        "batch": batch,
        "mc_samples": 1,
        "steps_timed": steps,
        "step_ms": round(dt / steps * 1e3, 1),
        "note": (
            "Measured by benchmarks/torch_anchor.py running the live reference "
            "code on this host's CPU — the only hardware the reference supports "
            "here. NOT an accelerator number; labeled as such in bench.py."
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    result = measure(args.batch, args.steps)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
