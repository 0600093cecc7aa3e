"""End-to-end CLI phases: train writes {model}_final, then the
fit_laplace / multix downstream phases consume it — the reference's
per-task fit_laplace.py / eval_ensembles.py checkpoint protocol
(civilcomments/eval_ensembles.py:34-48, SURVEY.md §2.5)."""
import json
import os

import numpy as np
import pytest

from beyond_deep_ensembles_tpu import run as cli

SWEEP = """
---
name: "DEFAULT"
repetitions: 2
params:
  tiny: true
  epochs: 1
  batch_size: 16
  eval_batch_size: 32
  eval_samples: 2
  subsample: 48
  test_subsample: 48
---
name: "MAP"
params: {model: "map"}
---
name: "MCD"
params: {model: "mcd", dropout_p: 0.1}
"""


def _read_metrics(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_unsupported_task_phase_raises():
    """cifar supports only fit_laplace/multix downstream phases; eval and
    drop_rates must raise instead of silently running multix (ADVICE r2)."""
    for phase in ("eval", "drop_rates"):
        with pytest.raises(ValueError, match="not supported"):
            cli.run_phase("cifar", phase, {}, ["/nonexistent"], None)


@pytest.mark.slow
def test_train_then_phases(tmp_path):
    sweep = tmp_path / "sweep.yaml"
    sweep.write_text(SWEEP)
    out = str(tmp_path / "results")

    # Phase 1: train both repetitions; each writes map_final.
    cli.main(["camelyon17", str(sweep), "--out", out, "--name", "MAP"])
    for rep in range(2):
        rep_dir = os.path.join(out, "MAP_0", f"rep_{rep}")
        assert os.path.isdir(os.path.join(rep_dir, "map_final")), rep_dir

    # Phase 2: post-hoc Laplace on each rep's saved MAP checkpoint.
    cli.main(["camelyon17", str(sweep), "--out", out, "--phase", "fit_laplace", "--rep", "0", "--name", "MAP"])
    lap_metrics = _read_metrics(
        os.path.join(out, "MAP_0", "rep_0", "fit_laplace", "metrics.jsonl")
    )
    assert np.isfinite(lap_metrics[-1]["accuracy"])

    # Phase 3: MultiX over the two reps (plus leave-one-out variant).
    cli.main(["camelyon17", str(sweep), "--out", out, "--phase", "multix", "--name", "MAP"])
    mx = _read_metrics(os.path.join(out, "MAP_0", "multix", "metrics.jsonl"))
    assert np.isfinite(mx[-1]["ece"])

    cli.main(
        ["camelyon17", str(sweep), "--out", out, "--phase", "multix", "--leave-out", "1",
         "--name", "MAP"]
    )
    assert os.path.exists(os.path.join(out, "MAP_0", "multix_lo1", "metrics.jsonl"))

    # Phase 4: pure re-eval of the saved checkpoint (reference eval_only.py).
    cli.main(["camelyon17", str(sweep), "--out", out, "--phase", "eval", "--rep", "0",
              "--name", "MAP"])
    ev = _read_metrics(os.path.join(out, "MAP_0", "rep_0", "eval", "metrics.jsonl"))
    assert np.isfinite(ev[-1]["accuracy"])


@pytest.mark.slow
def test_mcd_drop_rate_sweep(tmp_path):
    """Train one tiny MCD run, then the drop_rates phase evaluates the
    same checkpoint under several rates (reference test_drop_rates.py)."""
    from beyond_deep_ensembles_tpu.experiments import wilds_task

    sweep = tmp_path / "sweep.yaml"
    sweep.write_text(SWEEP)
    out = str(tmp_path / "results")
    cli.main(["camelyon17", str(sweep), "--out", out, "--name", "MCD", "--rep", "0"])

    cfg = {"tiny": True, "epochs": 1, "batch_size": 16, "eval_batch_size": 32,
           "eval_samples": 2, "subsample": 48, "test_subsample": 48,
           "dropout_p": 0.1}
    res = wilds_task.sweep_drop_rates_phase(
        "camelyon17", cfg, os.path.join(out, "MCD_0", "rep_0"), rates=(0.1, 0.5)
    )
    assert set(res) == {"p=0.1", "p=0.5"}
    for r in res.values():
        assert np.isfinite(r["ece"])
