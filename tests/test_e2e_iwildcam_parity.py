"""END-TO-END differential parity on the WILDS/iWildCam track: train the
LIVE reference iwildcam experiment loop (reference experiments/iwildcam/
iwildcam.py:113-180 train_model + :40-60 eval_model with the real
experiments/iwildcam/models.py builders) and our experiments/
wilds_task.py engine on IDENTICAL data with matched hyperparameters,
from the SAME initial weights; assert final macro-F1 / accuracy /
posterior log-likelihood / ECE agreement.

What this track adds over the FMoW/RxRx1 ones:
- the FULL-MODEL ExponentialLR branch: iwildcam.py:124-127 builds
  ``ExponentialLR(optimizer.get_base_optimizer(), gamma=lr_decay)`` and
  steps it per epoch. The reference's LastLayerBayesianOptimizer
  deliberately RAISES on get_base_optimizer (src/algos/algo.py:119-120),
  so on iwildcam lr_decay composes only with full-model optimizers —
  "map" (MAPOptimizer) and "bbb" (BBBOptimizer over all params) here.
- the macro-F1 official metric (iwildcam.py:52 ``F1-macro_all``), the
  only WILDS metric not yet covered end-to-end. The stub dataset.eval
  computes it with sklearn exactly as the wilds package does; ours is
  independently pinned to the same sklearn convention in
  tests/test_wilds.py::test_macro_f1_matches_sklearn_official_convention.
- full-model BBB over a conv backbone (build_bbb, iwildcam/models.py:
  104-112: BBBLinear head, BBBOptimizer over ALL parameters), not
  previously exercised by any e2e track (UCI covers bbb on an MLP only).

Protocol notes, mirroring tests/test_e2e_rxrx1_parity.py: torchvision's
resnet50 served by the shared tiny-topology shim (transplant
logit-parity-proven in tests/test_converter_parity.py),
RESNET_OUT_DIMS patched to the tiny feature width, static BN via the
reference's own patch_batchnorm, both frameworks starting from the
reference model's t=0 state_dict via the order-based converter.
N_CLASSES stays the reference's real 182 (iwildcam/models.py:22); the
synthetic data populates 10 of them.
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
sklearn_metrics = pytest.importorskip("sklearn.metrics")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

N_TRAIN, N_TEST = 256, 256
BATCH = 32
EPOCHS = 12
LR = 0.01
WD = 1e-4
LR_DECAY = 0.85  # per-epoch ExponentialLR gamma (iwildcam.py:125)
PRIOR_STD = 1.0
BBB_MC = 2
STAGES = (1, 1)  # == our engine's tiny stage_sizes for iwildcam/rxrx1
N_CLASSES = 182  # the reference's real iWildCam head width
EVAL_SAMPLES = {"map": 1, "bbb": 8}


def _make_raw_data():
    from beyond_deep_ensembles_tpu.data import cifar as C

    xtr, ytr = C._synthetic_cifar(N_TRAIN, seed=51, hard=True)
    xte, yte = C._synthetic_cifar(N_TEST, seed=52, hard=True)
    rng = np.random.RandomState(13)
    mtr = rng.randint(0, 4, size=(N_TRAIN, 1)).astype(np.int64)
    mte = rng.randint(0, 4, size=(N_TEST, 1)).astype(np.int64)
    return (
        xtr.astype(np.float32), ytr.astype(np.int64), mtr,
        xte.astype(np.float32), yte.astype(np.int64), mte,
    )


# ---------------------------------------------------------------------------
# Reference-side shims
# ---------------------------------------------------------------------------


def _tiny_resnet50(pretrained=False, **kw):
    del pretrained, kw
    from _ref_stubs import make_tiny_resnet50

    return make_tiny_resnet50(STAGES, N_CLASSES)


class _StubWildsDataset:
    def __init__(self, x, y, meta, train):
        self.x, self.y, self.meta, self.train = x, y, meta, train

    def eval(self, preds, targets, metadata):
        """The real wilds iwildcam dataset.eval: sklearn macro-F1 over all
        examples, keyed 'F1-macro_all' (consumed at iwildcam.py:52)."""
        del metadata
        f1 = sklearn_metrics.f1_score(
            targets.numpy(), preds.numpy(), average="macro"
        )
        return {"F1-macro_all": float(f1)}, ""


def _install_iwildcam_stubs(arrays):
    from _ref_stubs import (
        install_common_stubs,
        install_torchvision_stub,
        install_wilds1_stub,
    )

    install_torchvision_stub(resnet50=_tiny_resnet50)
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

    def iwildcam_split(path, split):
        del path
        return _StubWildsDataset(*splits[split], train=split == "train")

    def iwildcam_loader(dataset, batch_size, subsample=None):
        del subsample
        return torch.utils.data.DataLoader(
            torch.utils.data.TensorDataset(dataset.x, dataset.y, dataset.meta),
            batch_size=batch_size,
            shuffle=dataset.train,
            num_workers=0,
        )

    install_wilds1_stub(
        iwildcam_split=iwildcam_split, iwildcam_loader=iwildcam_loader
    )


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
        "scratch": True,
        "lr_decay": LR_DECAY,
        "prior_std": PRIOR_STD,
        "base_optimizer": {"lr": LR, "weight_decay": WD},
        # iwildcam.yaml:140-143 bbb block
        "bbb": {
            "mc_samples": BBB_MC,
            "kl_rescaling": 1.0,
            "dataset_size": N_TRAIN,
        },
    }


def _run_reference(model: str, arrays, tmpdir: str, seed: int = 1):
    import copy

    _install_iwildcam_stubs(arrays)
    import experiments.iwildcam.models as ref_models

    ref_models.RESNET_OUT_DIMS = 512 if len(STAGES) == 2 else 2048
    import experiments.iwildcam.iwildcam as ref_iwildcam

    torch.manual_seed(seed)
    device = torch.device("cpu")
    config = _ref_config(model)
    ensemble = ref_models.get_model(model, config, device)
    init_sd = copy.deepcopy(ensemble.models_and_optimizers[0][0].state_dict())
    from _ref_stubs import RecordLog

    log = RecordLog()
    ref_iwildcam.train_model(
        ensemble, device, config, log, tmpdir.rstrip("/") + "/"
    )
    res = ref_iwildcam.eval_model(ensemble, config, device, split="test")
    return {
        "accuracy": float(res["accuracy"]),
        "macro_f1": float(res["macro_f1"]),
        "avg_ll": float(res["log_likelihood"]),
        "ece": float(res["ece"]),
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
        # per-epoch ExponentialLR staircase on the full-model optimizer
        # (iwildcam.py:124-127,157-158)
        "lr_schedule_kind": "exponential",
        "lr_decay_rate": LR_DECAY,
        "steps_per_epoch": spe,
        "dropout_p": None,
        "prior_std": PRIOR_STD,
        "bbb_mc_samples": BBB_MC,
        "kl_rescaling": 1.0,
        "tiny": True,
        "static_bn": True,
        "pretrained": False,
        "torchvision_arch": True,
        "dataset_size": N_TRAIN,
        "seed": seed,
    }
    built = wilds_task.build("iwildcam", config, jax.random.key(seed), spe)
    transplanted = convert_torch_state_dict(init_sd, built.state.params)
    if model == "map":
        built.state = built.state.replace(params=transplanted)
    else:
        # bbb: the BBB head's rho leaves stay at our init (the converter
        # maps the torch means); re-init posterior state on the
        # transplanted tree
        built.state = built.method.init(
            jax.random.key(seed + 1), transplanted, built.state.model_state
        )
    from _ref_stubs import loss_capture

    log, losses = loss_capture()
    built = wilds_task.train(built, config, xtr, ytr, log=log)
    res = wilds_task.eval_task(built, "iwildcam", config, xte, yte, mte)
    return {
        "accuracy": float(res["accuracy"]),
        "macro_f1": float(res["macro_f1"]),
        "avg_ll": float(res["avg_log_likelihood"]),
        "ece": float(res["ece"]),
    }, losses


@pytest.fixture(scope="module")
def arrays():
    return _make_raw_data()


# Tolerances: same t=0 weights; nuisances are minibatch order and (for
# bbb) per-MC-sample weight noise with unmatched RNGs (the variational
# head samples every forward). macro-F1 over 10 populated classes is the
# most seed-sensitive metric (per-class F1 averages amplify single-image
# flips), hence its wider band.
_TOL = {
    "map": {"accuracy": 0.06, "macro_f1": 0.08, "avg_ll": 0.15, "ece": 0.08},
    "bbb": {"accuracy": 0.08, "macro_f1": 0.10, "avg_ll": 0.40, "ece": 0.10},
}

# both must beat chance (10 populated classes of the 182-way head) by a
# clear margin
_FLOOR = {"map": 0.3, "bbb": 0.2}


N_MEMBERS = 3
MULTIX_EPOCHS = 6


def test_e2e_multix_ensemble_parity(arrays, tmp_path):
    """eval_ensembles.py combination parity: train three independent map
    members in the LIVE reference loop, ensemble them DeepEnsemble-style
    exactly as the reference's MultiX phase does
    (iwildcam/eval_ensembles.py:35-67: load ``{model}_final`` members,
    ``DeepEnsemble(members)``, ``eval_model``), then evaluate the SAME
    three final weight sets through our ``multix_from_checkpoints``
    combination. Identical member weights on both sides, deterministic
    map forward passes, batch-aligned loaders — only the member
    distribution (round-robin over eval samples, ensemble.py:38-43), the
    logsumexp Bayesian model average and the eval stack are under test,
    so tolerances are tight."""
    import copy

    import jax

    from beyond_deep_ensembles_tpu.experiments import phases, wilds_task
    from beyond_deep_ensembles_tpu.models.torch_convert import (
        convert_torch_state_dict,
    )

    _install_iwildcam_stubs(arrays)
    import experiments.iwildcam.models as ref_models

    ref_models.RESNET_OUT_DIMS = 512 if len(STAGES) == 2 else 2048
    import experiments.iwildcam.iwildcam as ref_iwildcam
    from src.algos.ensemble import DeepEnsemble

    from _ref_stubs import RecordLog

    device = torch.device("cpu")
    config = _ref_config("map")
    config["epochs"] = MULTIX_EPOCHS
    config["eval_samples"] = N_MEMBERS  # one draw per member (ensemble.py:38-43)

    members, finals = [], []
    for i in range(N_MEMBERS):
        torch.manual_seed(10 + i)
        single = ref_models.get_model("map", config, device)
        ref_iwildcam.train_model(
            single, device, config, RecordLog(), str(tmp_path) + "/"
        )
        members.append(single.models_and_optimizers[0])
        finals.append(
            copy.deepcopy(single.models_and_optimizers[0][0].state_dict())
        )
    ens = DeepEnsemble(members)
    ref = ref_iwildcam.eval_model(ens, config, device, split="test")

    xtr, _, _, xte, yte, mte = arrays
    spe = N_TRAIN // BATCH
    our_config = {
        **wilds_task.DEFAULT_CONFIG,
        "model": "map",
        "members": 1,
        "epochs": MULTIX_EPOCHS,
        "batch_size": BATCH,
        "eval_batch_size": BATCH,
        "eval_samples": N_MEMBERS,
        "ece_bins": 10,
        "optimizer_kind": "adam",
        "lr": LR,
        "weight_decay": WD,
        "steps_per_epoch": spe,
        "dropout_p": None,
        "prior_std": PRIOR_STD,
        "tiny": True,
        "static_bn": True,
        "pretrained": False,
        "torchvision_arch": True,
        "dataset_size": N_TRAIN,
        "seed": 0,
    }
    built = wilds_task.build("iwildcam", our_config, jax.random.key(0), spe)
    states = [
        built.state.replace(params=convert_torch_state_dict(sd, built.state.params))
        for sd in finals
    ]
    built.method, built.state = phases.multix_from_checkpoints(built.method, states)
    ours = wilds_task.eval_task(built, "iwildcam", our_config, xte, yte, mte)
    print(f"[multix] reference={ref} ours={ours}")

    # same weights evaluated by both stacks: only forward-pass numerics
    # (flax vs torch, logit parity ~1e-5 in test_converter_parity) and
    # batch-stat BN accumulation order separate them
    assert abs(ours["accuracy"] - float(ref["accuracy"])) < 0.01
    assert abs(ours["macro_f1"] - float(ref["macro_f1"])) < 0.02
    assert abs(ours["avg_log_likelihood"] - float(ref["log_likelihood"])) < 0.01
    assert abs(ours["ece"] - float(ref["ece"])) < 0.01


@pytest.mark.parametrize("model", ["map", "bbb"])
def test_e2e_iwildcam_parity(model, arrays, tmp_path):
    ref, init_sd, ref_losses = _run_reference(model, arrays, str(tmp_path))
    ours, our_losses = _run_ours(model, arrays, init_sd)
    print(f"[{model}] reference={ref} ours={ours}")
    print(f"[{model}] ref_losses={ref_losses}")
    print(f"[{model}] our_losses={our_losses}")
    assert np.isfinite(list(ours.values())).all()
    assert len(ref_losses) == len(our_losses) == EPOCHS
    for e in (0, 1, 2, EPOCHS - 1):
        bound = max(0.40, 0.25 * abs(ref_losses[e]))
        assert abs(ref_losses[e] - our_losses[e]) < bound, (
            f"{model}: epoch {e} train loss ref={ref_losses[e]:.3f} "
            f"ours={our_losses[e]:.3f}"
        )
    assert ref["accuracy"] > _FLOOR[model] and ours["accuracy"] > _FLOOR[model]
    for key in ("accuracy", "macro_f1", "avg_ll", "ece"):
        assert abs(ours[key] - ref[key]) < _TOL[model][key], (
            f"{model}: {key} ours={ours[key]:.4f} ref={ref[key]:.4f}"
        )
