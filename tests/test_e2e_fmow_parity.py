"""END-TO-END differential parity on the WILDS/FMoW track: train the
LIVE reference fmow experiment loop (reference experiments/fmow/fmow.py:
141-211 train_model + :58-88 eval_model with the real
experiments/fmow/models.py last-layer builders) and our
experiments/wilds_task.py engine on IDENTICAL data with matched
hyperparameters, from the SAME initial weights; assert final accuracy /
posterior log-likelihood / ECE / per-region worst accuracy agreement.

What this track adds over the Camelyon one (same engine, same DenseNet
family): the DUAL ExponentialLR scheduler — fmow.py:154-158 builds
ExponentialLR(gamma=lr_decay) for BOTH the last-layer head's base
optimizer and the deterministic backbone optimizer and steps them once
per epoch — composed with LastLayerBayesianOptimizer (ll_ivon /
swag_ll), Adam on both sides (fmow/models.py:60), patch_batchnorm-style
static BN (fmow/models.py:52), and the official FMoW region metric
surface (fmow.py:84-86 eval_region over regions 0..4; region id 5
"Other" is excluded exactly as the WILDS dataset.eval does).

Only the LastLayer variants are runnable through the LIVE loop: the
reference's train_model references ``scheduler2`` unconditionally at
fmow.py:187 but only binds it on the LastLayerBayesianOptimizer branch
(fmow.py:154-158), so every full-model fmow variant crashes with
NameError in the reference itself — a latent reference bug this track
documents by construction (full-model parity for this engine is covered
by the Camelyon and CIFAR tracks).

Protocol notes, mirroring tests/test_e2e_camelyon_parity.py:
- torchvision is not installed here (zero egress), so ``densenet121`` is
  served by a stub module whose backbone is the reference's OWN DenseNet
  (src/architectures/densenet.py:166-203) at the matched tiny shape,
  exposing torchvision's ``.features`` / ``.classifier`` split that the
  ll builders slice (fmow/models.py:87-88,117-119). DENSENET_OUT_DIMS is
  patched to the tiny feature width (the reference hardcodes 1024,
  fmow/models.py:19).
- torch.compile (fmow/models.py:139) is patched to identity: it is a
  perf-only wrapper, and inductor cold-compiles for minutes on this CPU.
- Static BN on both sides via the reference's own patch_batchnorm
  (fmow/models.py:52); eval loaders unshuffled and batch-size-matched
  because batch-stat BN makes predictions depend on batch composition.
- Both frameworks start from the reference model's t=0 state_dict
  (order-based transplant proven by test_converter_parity's DenseNet
  case); the ll methods re-init on the transplanted tree (the
  backbone/head split happens in init; posterior state is zeros at t=0).
- Data: hard synthetic 10-of-62-class task (overlapping prototypes +
  label noise) with region ids 0..5 in metadata column 0 — id 5 must be
  excluded from worst-region on both sides.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "src")),
        reason="reference checkout not available",
    ),
]

torch = pytest.importorskip("torch")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

N_TRAIN, N_TEST = 256, 256
BATCH = 32
EPOCHS = 12
LR = 0.01
WD = 1e-4
LR_DECAY = 0.8  # gamma: lr falls to 0.8^11 ~ 0.086x — the schedule matters
# softer head prior than the Amazon track's (prior_prec 50 ~= weight
# decay 0.2 at N=256 — measured to pin the 16->62 head near chance here)
IVON_LR, IVON_PREC = 0.1, 5.0
SWAG_START = 6
SWAG_DEVIATIONS = 6
EVAL_SAMPLES = {"swag_ll": 8, "ll_ivon": 8}
GROWTH, BLOCKS, INIT_F, BN_SIZE = 4, (2, 2), 8, 2  # == wilds_task tiny
N_CLASSES = 62  # the reference's real FMoW head width (fmow/models.py:20)


def _make_raw_data():
    """Shared float32 arrays: hard synthetic (10 populated classes of the
    62-way head), 32x32x3, region ids 0..5 in metadata column 0."""
    from beyond_deep_ensembles_tpu.data import cifar as C

    xtr, ytr = C._synthetic_cifar(N_TRAIN, seed=31, hard=True)
    xte, yte = C._synthetic_cifar(N_TEST, seed=32, hard=True)
    rng = np.random.RandomState(9)
    # include the excluded "Other" region (id 5) so the exclusion
    # semantics is part of the differential surface
    mtr = rng.randint(0, 6, size=(N_TRAIN, 1)).astype(np.int64)
    mte = rng.randint(0, 6, size=(N_TEST, 1)).astype(np.int64)
    return (
        xtr.astype(np.float32), ytr.astype(np.int64), mtr,
        xte.astype(np.float32), yte.astype(np.int64), mte,
    )


# ---------------------------------------------------------------------------
# Reference-side shims
# ---------------------------------------------------------------------------


class _StubWildsDataset:
    """Holds the split's tensors; eval_model's ``dataset.eval`` hook only
    feeds results["worst_region_acc"], which this track derives instead
    from the reference's own eval_region outputs (fmow.py:84-86), so the
    stub's eval is inert."""

    def __init__(self, x, y, meta, train):
        self.x, self.y, self.meta, self.train = x, y, meta, train

    def eval(self, preds, targets, metadata):
        return [{"acc_worst_region": float("nan")}]


def _install_fmow_stubs(arrays):
    from _ref_stubs import install_common_stubs, install_wilds1_stub

    # torchvision (fmow/models.py:3) is not installed: serve densenet121
    # from a stub module built on the reference's OWN DenseNet.
    if "torchvision" not in sys.modules:
        import importlib.machinery
        import types

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv_models = types.ModuleType("torchvision.models")
        tv_models.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.models", None
        )
        tv_models.densenet121 = _tiny_densenet121
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models

    install_common_stubs()

    xtr, ytr, mtr, xte, yte, mte = arrays

    def tensors(x, y, m):
        return (
            torch.from_numpy(np.ascontiguousarray(x)).permute(0, 3, 1, 2),
            torch.from_numpy(np.ascontiguousarray(y)).long(),
            torch.from_numpy(np.ascontiguousarray(m)).long(),
        )

    splits = {
        "train": tensors(xtr, ytr, mtr),
        "test": tensors(xte, yte, mte),
        "val": tensors(xte, yte, mte),
        "id_val": tensors(xtr, ytr, mtr),
    }

    def fmow_split(path, split):
        del path
        return _StubWildsDataset(*splits[split], train=split == "train")

    def fmow_loader(dataset, batch_size, subsample=None):
        del subsample
        return torch.utils.data.DataLoader(
            torch.utils.data.TensorDataset(dataset.x, dataset.y, dataset.meta),
            batch_size=batch_size,
            # unshuffled eval: batch-stat BN predictions depend on batch
            # composition; both frameworks must see the same eval batches
            shuffle=dataset.train,
            num_workers=0,
        )

    install_wilds1_stub(fmow_split=fmow_split, fmow_loader=fmow_loader)


def _tiny_densenet121(pretrained=False, **kw):
    """torchvision ``densenet121`` stand-in: the reference's OWN DenseNet
    (src/architectures/densenet.py:166) at the matched tiny shape, behind
    torchvision's ``.features``/``.classifier`` interface that the fmow
    builders slice for the backbone/head optimizer split
    (fmow/models.py:87-88,117-119). pretrained weights are unavailable
    here; both frameworks start from this module's t=0 init instead."""
    del pretrained, kw
    from src.architectures.densenet import DenseNet

    class TinyDensenet121(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = DenseNet(GROWTH, BLOCKS, 3, INIT_F, BN_SIZE)
            self.classifier = torch.nn.Linear(
                self.features.out_features, N_CLASSES
            )

        def forward(self, x):
            return self.classifier(torch.flatten(self.features(x), 1))

    return TinyDensenet121()


def _ref_config(model: str) -> dict:
    return {
        "model": model,
        "members": 1,
        "epochs": EPOCHS,
        "batch_size": BATCH,
        "eval_samples": EVAL_SAMPLES[model],
        "ece_bins": 10,
        "use_amp": False,
        "train_on_val": False,
        "eval_while_train": False,
        "data_path": "",
        "subsample": None,
        "test_subsample": None,
        "static_bn": True,
        "lr_decay": LR_DECAY,
        "base_optimizer": {"lr": LR, "weight_decay": WD},
        "deterministic_optimizer": {"lr": LR, "weight_decay": WD},
        "swag": {
            "start_epoch": SWAG_START,
            "update_interval": 1,
            "deviation_samples": SWAG_DEVIATIONS,
        },
        "ivon": {
            "lr": IVON_LR,
            "prior_prec": IVON_PREC,
            "damping": 0.001,
            "augmentation": 1.0,
            "mc_samples": 2,
            "dataset_size": N_TRAIN,
        },
    }


def _run_reference(model: str, arrays, tmpdir: str, seed: int = 1):
    import copy

    _install_fmow_stubs(arrays)
    import experiments.fmow.models as ref_models

    # tiny feature width (the reference hardcodes torchvision's 1024,
    # fmow/models.py:19); builders read the module global at call time
    out_dims = 2 * INIT_F  # 8 -> blocks/transition -> 16
    ref_models.DENSENET_OUT_DIMS = out_dims

    # perf-only wrapper (fmow/models.py:139); inductor cold-compiles for
    # minutes on this CPU and changes no math
    orig_compile = torch.compile
    torch.compile = lambda m, **kw: m
    try:
        import experiments.fmow.fmow as ref_fmow

        torch.manual_seed(seed)
        device = torch.device("cpu")
        config = _ref_config(model)
        ensemble = ref_models.get_model(model, config, device)
    finally:
        torch.compile = orig_compile

    init_sd = copy.deepcopy(ensemble.models_and_optimizers[0][0].state_dict())
    from _ref_stubs import RecordLog

    log = RecordLog()
    ref_fmow.train_model(ensemble, device, config, log, tmpdir.rstrip("/") + "/")
    res = ref_fmow.eval_model(ensemble, config, device, split="test")
    # worst-region from the reference's own per-region eval (fmow.py:84-86
    # loops regions 0..4, excluding id 5 exactly as dataset.eval does)
    region_accs = [
        float(res[f"region_{r}"]["accuracy"])
        for r in range(5)
        if int(res[f"region_{r}"]["count"]) > 0
    ]
    return {
        "accuracy": float(res["all"]["accuracy"]),
        "avg_ll": float(res["all"]["log_likelihood"]),
        "ece": float(res["all"]["ece"]),
        "worst_region_acc": min(region_accs),
    }, init_sd, log.losses


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------


def _run_ours(model: str, arrays, init_sd, seed: int = 0):
    import jax

    from beyond_deep_ensembles_tpu.experiments import wilds_task
    from beyond_deep_ensembles_tpu.models.torch_convert import (
        convert_torch_state_dict,
    )

    xtr, ytr, _, xte, yte, mte = arrays
    spe = N_TRAIN // BATCH
    config = {
        **wilds_task.DEFAULT_CONFIG,
        "model": model,
        "members": 1,
        "epochs": EPOCHS,
        "batch_size": BATCH,
        "eval_batch_size": BATCH,
        "eval_samples": EVAL_SAMPLES[model],
        "ece_bins": 10,
        "optimizer_kind": "adam",
        "lr": LR,
        "weight_decay": WD,
        # the dual ExponentialLR: one gamma on backbone AND head base
        # optimizer, stepped once per epoch (fmow.py:154-158,186-188)
        "lr_schedule_kind": "exponential",
        "lr_decay_rate": LR_DECAY,
        "steps_per_epoch": spe,
        "dropout_p": None,
        "prior_std": 1.0,
        "swag_start_epoch": SWAG_START,
        "swag_deviation_samples": SWAG_DEVIATIONS,
        "swag_updates": spe * (EPOCHS - SWAG_START),
        "ivon_lr": IVON_LR,
        "ivon_prior_prec": IVON_PREC,
        "ivon_mc_samples": 2,
        "ivon_damping": 0.001,
        "tiny": True,
        "static_bn": True,
        "pretrained": False,
        "dataset_size": N_TRAIN,
        "seed": seed,
    }
    built = wilds_task.build("fmow", config, jax.random.key(seed), spe)
    # Re-init the ll method on the transplanted t=0 params: the
    # backbone/head split happens in init, and the optimizer/posterior
    # state is all zeros at t=0 anyway.
    built.state = built.method.init(
        jax.random.key(seed + 1),
        convert_torch_state_dict(init_sd, built.state.params),
        built.state.model_state,
    )
    from _ref_stubs import loss_capture

    log, losses = loss_capture()
    built = wilds_task.train(built, config, xtr, ytr, log=log)
    res = wilds_task.eval_task(built, "fmow", config, xte, yte, mte)
    return {
        "accuracy": float(res["accuracy"]),
        "avg_ll": float(res["avg_log_likelihood"]),
        "ece": float(res["ece"]),
        "worst_region_acc": float(res["worst_region_acc"]),
    }, losses


@pytest.fixture(scope="module")
def arrays():
    return _make_raw_data()


# Tolerances: same t=0 weights; nuisances are minibatch order and
# eval-time posterior-draw RNG (plus iVON's per-MC-sample weight noise
# with unmatched RNGs — the Amazon track measured its intrinsic seed
# spread, same allowance here). worst_region is a min over ~40-sample
# region accuracies, so it is intrinsically noisier than "all" accuracy.
_TOL = {
    "swag_ll": {"accuracy": 0.07, "avg_ll": 0.15, "ece": 0.10,
                "worst_region_acc": 0.12},
    "ll_ivon": {"accuracy": 0.08, "avg_ll": 0.40, "ece": 0.10,
                "worst_region_acc": 0.14},
}


@pytest.mark.parametrize("model", ["swag_ll", "ll_ivon"])
def test_e2e_fmow_parity(model, arrays, tmp_path):
    ref, init_sd, ref_losses = _run_reference(model, arrays, str(tmp_path))
    ours, our_losses = _run_ours(model, arrays, init_sd)
    print(f"[{model}] reference={ref} ours={ours}")
    print(f"[{model}] ref_losses={ref_losses}")
    print(f"[{model}] our_losses={our_losses}")
    assert np.isfinite(list(ours.values())).all()
    assert len(ref_losses) == len(our_losses) == EPOCHS
    # same-init training dynamics must track, scale-aware for iVON's
    # noisy early MC losses
    for e in (0, 1, 2, EPOCHS - 1):
        bound = max(0.40, 0.25 * abs(ref_losses[e]))
        assert abs(ref_losses[e] - our_losses[e]) < bound, (
            f"{model}: epoch {e} train loss ref={ref_losses[e]:.3f} "
            f"ours={our_losses[e]:.3f}"
        )
    # both must beat chance (10 populated classes of the 62-way head) by
    # a clear margin or the comparison is vacuous. ll_ivon's measured
    # ceiling at this protocol is lower (the 16->62 iVON head trains
    # under per-MC-sample weight noise; both frameworks land ~0.21-0.23,
    # avg_ll ~-3.0 vs the uniform-62 -4.13) — still >2x chance, with the
    # per-epoch loss-tracking assertions carrying the dynamics evidence.
    floor = {"swag_ll": 0.3, "ll_ivon": 0.18}[model]
    assert ref["accuracy"] > floor and ours["accuracy"] > floor
    for key in ("accuracy", "avg_ll", "ece", "worst_region_acc"):
        assert abs(ours[key] - ref[key]) < _TOL[model][key], (
            f"{model}: {key} ours={ours[key]:.4f} ref={ref[key]:.4f}"
        )
