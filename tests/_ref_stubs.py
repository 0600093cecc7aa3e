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


def install_torchvision_stub(**models):
    """torchvision is not installed (zero egress); serve a stub
    ``torchvision.models`` module carrying the given model factories
    (e.g. resnet50=..., densenet121=...). Reuses an already-installed
    stub so the rxrx1/iwildcam/fmow tracks can coexist in one process."""
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tv_models = _module("torchvision.models")
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    for name, factory in models.items():
        setattr(sys.modules["torchvision.models"], name, factory)


def make_tiny_resnet50(stages, n_classes):
    """torchvision ``resnet50`` topology at tiny stage sizes: exact
    torchvision v1.5 bottleneck layout and module-creation order (the
    transplant to our flax ResNet50(torchvision=True) is
    logit-parity-proven in tests/test_converter_parity.py), exposing the
    ``.conv1/.bn1/.layer1..layer4/.fc`` attributes the iwildcam/rxrx1
    last-layer builders slice for the backbone/head optimizer split
    (iwildcam/models.py:89-96, rxrx1/models.py:108-116). Stages beyond
    ``len(stages)`` are empty Sequentials."""
    import torch
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, width, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(
                width, width, 3, stride=stride, padding=1, bias=False
            )
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = torch.relu(self.bn1(self.conv1(x)))
            h = torch.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return torch.relu(h + idt)

    class TinyResnet50(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            cin = 64
            for stage in range(4):
                blocks = []
                n = stages[stage] if stage < len(stages) else 0
                cout = 256 * 2**stage
                for b in range(n):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    blocks.append(Bottleneck(cin, cout // 4, cout, stride))
                    cin = cout
                setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            self.out_dims = cin
            self.fc = tnn.Linear(cin, n_classes)

        def forward(self, x):
            h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for stage in range(4):
                h = getattr(self, f"layer{stage + 1}")(h)
            return self.fc(h.mean(dim=(2, 3)))

    return TinyResnet50()


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
