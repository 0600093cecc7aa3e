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
