"""Shared import shims for running the LIVE reference experiment code on
this host: inert stand-ins for the deps that are not installed (wandb,
cw2, laplace-torch, netcal) plus the reference's own stale-import wart.
None of these carry algorithmic behavior — the algorithms, train loops
and eval code under test are the reference's real modules.

Used by the end-to-end differential parity tracks
(tests/test_e2e_cifar_parity.py, tests/test_e2e_camelyon_parity.py).
"""
from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"


def install_common_stubs():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    wandb = types.ModuleType("wandb")
    wandb.init = lambda **kw: None
    wandb.log = lambda *a, **kw: None
    wandb.finish = lambda: None
    sys.modules["wandb"] = wandb

    cw2 = types.ModuleType("cw2")
    cw_data = types.ModuleType("cw2.cw_data")
    cw_logging = types.ModuleType("cw2.cw_data.cw_logging")
    cw_logging.LoggerArray = type("LoggerArray", (), {})
    cw_logging.getLogger = lambda: None
    cw_logging.AbstractLogger = type("AbstractLogger", (), {})
    experiment = types.ModuleType("cw2.experiment")
    experiment.AbstractExperiment = type("AbstractExperiment", (), {})
    cw_error = types.ModuleType("cw2.cw_error")
    cw_error.ExperimentSurrender = type("ExperimentSurrender", (Exception,), {})
    cluster_work = types.ModuleType("cw2.cluster_work")
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

    laplace = types.ModuleType("laplace")
    laplace.Laplace = type("Laplace", (), {})
    curvature = types.ModuleType("laplace.curvature")
    curvature.BackPackGGN = type("BackPackGGN", (), {})
    laplace.curvature = curvature
    sys.modules["laplace"] = laplace
    sys.modules["laplace.curvature"] = curvature

    netcal = types.ModuleType("netcal")
    netcal_metrics = types.ModuleType("netcal.metrics")
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
    wilson = types.ModuleType("src.wilson")
    wilson.WilsonHMC = type("WilsonHMC", (), {})
    sys.modules["src.wilson"] = wilson
    import src as src_pkg

    src_pkg.wilson = wilson
