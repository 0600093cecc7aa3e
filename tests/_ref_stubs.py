"""Shared import shims for running the LIVE reference experiment code on
this host: inert stand-ins for the deps that are not installed (wandb,
cw2, laplace-torch, netcal) plus the reference's own stale-import wart.
None of these carry algorithmic behavior — the algorithms, train loops
and eval code under test are the reference's real modules.

Used by the end-to-end differential parity tracks
(tests/test_e2e_cifar_parity.py, tests/test_e2e_camelyon_parity.py).
"""
from __future__ import annotations

import importlib.machinery
import re
import sys
import types

REFERENCE = "/root/reference"


def _module(name: str) -> types.ModuleType:
    """Stub module with a real __spec__: transformers/accelerate probe
    importlib.util.find_spec('wandb'), which raises ValueError for an
    in-sys.modules module whose __spec__ is None."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def install_common_stubs():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    wandb = _module("wandb")
    wandb.init = lambda **kw: None
    wandb.log = lambda *a, **kw: None
    wandb.finish = lambda: None
    sys.modules["wandb"] = wandb

    cw2 = _module("cw2")
    cw_data = _module("cw2.cw_data")
    cw_logging = _module("cw2.cw_data.cw_logging")
    cw_logging.LoggerArray = type("LoggerArray", (), {})
    cw_logging.getLogger = lambda: None
    cw_logging.AbstractLogger = type("AbstractLogger", (), {})
    experiment = _module("cw2.experiment")
    experiment.AbstractExperiment = type("AbstractExperiment", (), {})
    cw_error = _module("cw2.cw_error")
    cw_error.ExperimentSurrender = type("ExperimentSurrender", (Exception,), {})
    cluster_work = _module("cw2.cluster_work")
    cluster_work.ClusterWork = type("ClusterWork", (), {})
    cw2.cw_data = cw_data
    cw_data.cw_logging = cw_logging
    cw2.experiment = experiment
    cw2.cw_error = cw_error
    cw2.cluster_work = cluster_work
    sys.modules.update(
        {
            "cw2": cw2,
            "cw2.cw_data": cw_data,
            "cw2.cw_data.cw_logging": cw_logging,
            "cw2.experiment": experiment,
            "cw2.cw_error": cw_error,
            "cw2.cluster_work": cluster_work,
        }
    )

    laplace = _module("laplace")
    laplace.Laplace = type("Laplace", (), {})
    curvature = _module("laplace.curvature")
    curvature.BackPackGGN = type("BackPackGGN", (), {})
    laplace.curvature = curvature
    sys.modules["laplace"] = laplace
    sys.modules["laplace.curvature"] = curvature

    netcal = _module("netcal")
    netcal_metrics = _module("netcal.metrics")
    netcal_metrics.ECE = type("ECE", (), {})
    netcal.metrics = netcal_metrics
    sys.modules["netcal"] = netcal
    sys.modules["netcal.metrics"] = netcal_metrics

    # reference stale-import wart (laplace_approx.py imports MAP which
    # src/algos/pp.py does not define)
    import src.algos.pp as ref_pp

    if not hasattr(ref_pp, "MAP"):
        ref_pp.MAP = ref_pp.MAPOptimizer

    # src.wilson imports the vendored bnn-hmc stack and loads published
    # checkpoints; experiments under test only need the symbol to import.
    wilson = _module("src.wilson")
    wilson.WilsonHMC = type("WilsonHMC", (), {})
    sys.modules["src.wilson"] = wilson
    import src as src_pkg

    src_pkg.wilson = wilson


class RecordLog:
    """Captures the reference train loops' per-epoch losses from their
    own log lines ('Epoch N: train loss X')."""

    _RE = re.compile(r"Epoch (\d+): train loss ([\d.eE+-]+)")

    def __init__(self):
        self.losses = []

    def info(self, msg):
        m = self._RE.search(str(msg))
        if m:
            self.losses.append(float(m.group(2)))


def loss_capture():
    """(log_fn, losses) capturing our train() 'epoch N: loss X' lines."""
    losses = []
    rex = re.compile(r"loss ([\d.eE+-]+)")

    def log(msg):
        m = rex.search(msg)
        if m:
            losses.append(float(m.group(1)))

    return log, losses


def install_wilds1_stub(**attrs):
    """Install a stub experiments.base.wilds1 module carrying the given
    loader attributes (the per-task split/loader functions stay with the
    test that owns the data)."""
    wilds1 = _module("experiments.base.wilds1")
    for k, v in attrs.items():
        setattr(wilds1, k, v)
    sys.modules["experiments.base.wilds1"] = wilds1
    import experiments.base as base_pkg

    base_pkg.wilds1 = wilds1
    return wilds1
