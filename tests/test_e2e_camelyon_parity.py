"""END-TO-END differential parity on the WILDS/Camelyon17 track: train
the LIVE reference camelyon experiment loop (reference
experiments/camelyon/camelyon.py:94-153 train_model + :36-56 eval_model
with the real experiments/camelyon/models.py builders and the real
config-driven DenseNet, src/architectures/densenet.py:166-210) and our
experiments/wilds_task.py engine on IDENTICAL data with matched
hyperparameters, from the SAME initial weights; assert final accuracy /
posterior log-likelihood / ECE agreement.

Complements the CIFAR and UCI tracks: this one exercises the WILDS
engine (build/train/eval_task), the DenseNet family, and the
(input, target, metadata) 3-tuple data path — the BASELINE.md parity
target architecture (Camelyon17 DenseNet-121 is the only workload with
stored reference numbers).

Protocol notes, mirroring tests/test_e2e_cifar_parity.py:
- The DenseNet is shrunk IDENTICALLY on both sides (growth 4, blocks
  (2,2), init 8, bn_size 2 == our engine's `tiny` knob; the reference
  builders hardcode the DenseNet-121 shape at
  experiments/camelyon/models.py:41, so the reference-side class is
  wrapped to the same tiny shape — the wrapped symbol is still the
  reference's real DenseNet). Static BN on both sides (batch stats at
  eval — the accuracy-critical setting per BASELINE.md; net_config
  track_running_stats=False == our static_bn=True).
- Eval batch size matches train batch size and divides the test-set
  size: with batch-stat BN the predictions depend on eval batch
  composition, so loaders on both sides are unshuffled at eval and see
  identical batches.
- Both frameworks start from the reference model's t=0 state_dict
  (transplant proven bit-exact by
  tests/test_converter_parity.py::test_reference_densenet_transplant_parity).
  The only nuisance left is minibatch order and eval-time sampling RNG.
- Data: hard synthetic binary task (overlapping CIFAR-style prototypes
  + 10% label noise, labels folded mod 2) so accuracy is bounded away
  from 1.0 and chance, and NLL/ECE are informative.
- Algorithms: map / mcd / swag — the static, cheap-on-torch-CPU family
  (the variational DenseNet step is minutes on this host; BBB-family
  experiment parity is covered by the UCI track).
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
EPOCHS = 16
LR = 0.02
WD = 1e-4
DROPOUT_P = 0.1
SWAG_START = 8
SWAG_DEVIATIONS = 8
RANK1_COMPONENTS = 2  # camelyon.yaml RANK1 block uses components
RANK1_MC = 2
EVAL_SAMPLES = {"map": 1, "mcd": 8, "swag": 8, "rank1": 8}
GROWTH, BLOCKS, INIT_F, BN_SIZE = 4, (2, 2), 8, 2  # == wilds_task tiny


def _make_raw_data():
    """Shared float32 arrays: hard synthetic folded to 2 classes
    (camelyon17 is binary), 32x32x3 (the tiny-backbone input size)."""
    from beyond_deep_ensembles_tpu.data import cifar as C

    xtr, ytr = C._synthetic_cifar(N_TRAIN, seed=21, hard=True)
    xte, yte = C._synthetic_cifar(N_TEST, seed=22, hard=True)
    ytr, yte = (ytr % 2).astype(np.int64), (yte % 2).astype(np.int64)
    rng = np.random.RandomState(7)
    mtr = rng.randint(0, 4, size=(N_TRAIN, 1)).astype(np.int64)
    mte = rng.randint(0, 4, size=(N_TEST, 1)).astype(np.int64)
    return (
        xtr.astype(np.float32), ytr, mtr,
        xte.astype(np.float32), yte, mte,
    )


# ---------------------------------------------------------------------------
# Reference-side shims
# ---------------------------------------------------------------------------


class _StubWildsDataset:
    """Minimal stand-in for a wilds dataset object: holds the split's
    tensors and exposes the ``.eval`` hook eval_model calls (the official
    camelyon metric is plain accuracy; the parity assertion uses the
    reference's own _analyze_output/calibration numbers, so the stub's
    eval can be inert)."""

    def __init__(self, x, y, meta, train):
        self.x, self.y, self.meta, self.train = x, y, meta, train

    def eval(self, preds, targets, metadata):
        return {}


def _install_wilds_stubs(arrays):
    from _ref_stubs import install_common_stubs, install_wilds1_stub

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

    def camelyon_split(path, split):
        del path
        return _StubWildsDataset(*splits[split], train=split == "train")

    def camelyon_loader(dataset, batch_size, subsample=None):
        del subsample
        return torch.utils.data.DataLoader(
            torch.utils.data.TensorDataset(dataset.x, dataset.y, dataset.meta),
            batch_size=batch_size,
            # unshuffled eval: batch-stat BN makes predictions depend on
            # batch composition; both frameworks must see the same
            # eval batches
            shuffle=dataset.train,
            num_workers=0,
        )

    install_wilds1_stub(
        camelyon_split=camelyon_split, camelyon_loader=camelyon_loader
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
        "dropout_p": DROPOUT_P,
        "prior_std": 1.0,  # consumed by _build_rank1 (camelyon/models.py:122)
        "optimizer": {
            "base": {"lr": LR, "weight_decay": WD, "momentum": 0.9},
            "swag": {
                "start_epoch": SWAG_START,
                "update_interval": 1,
                "deviation_samples": SWAG_DEVIATIONS,
            },
            # camelyon/models.py:141 BBBOptimizer(**config["optimizer"]["rank1"])
            "rank1": {
                "mc_samples": RANK1_MC,
                "kl_rescaling": 1.0,
                "dataset_size": N_TRAIN,
                "components": RANK1_COMPONENTS,
            },
        },
    }


def _run_reference(model: str, arrays, tmpdir: str, seed: int = 1):
    import copy

    _install_wilds_stubs(arrays)
    import experiments.camelyon.models as ref_models

    # Shrink the hardcoded DenseNet-121 shape (camelyon/models.py:41) to
    # the matched tiny shape, and select static BN (track_running_stats
    # False == batch stats at eval, src/architectures/densenet.py:124).
    # The wrapped symbol is still the reference's real DenseNet class.
    real_densenet = sys.modules["src.architectures.densenet"].DenseNet

    def tiny_densenet(growth, blocks, in_ch, init_f, bn_size, cfg):
        del growth, blocks, init_f, bn_size
        return real_densenet(
            GROWTH, BLOCKS, in_ch, INIT_F, BN_SIZE,
            {**cfg, "track_running_stats": False},
        )

    ref_models.DenseNet = tiny_densenet
    import experiments.camelyon.camelyon as ref_cam

    torch.manual_seed(seed)
    device = torch.device("cpu")
    config = _ref_config(model)
    ensemble = ref_models.get_model(model, config, device)
    init_sd = copy.deepcopy(ensemble.models_and_optimizers[0][0].state_dict())
    from _ref_stubs import RecordLog

    log = RecordLog()
    ref_cam.train_model(ensemble, device, config, log, tmpdir.rstrip("/") + "/")
    res = ref_cam.eval_model(ensemble, config, device, split="test")
    return {
        "accuracy": float(res["accuracy"]),
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
    config = {
        **wilds_task.DEFAULT_CONFIG,
        "model": model,
        "members": 1,
        "epochs": EPOCHS,
        "batch_size": BATCH,
        # matched eval batches: static BN's statistics are per-batch
        "eval_batch_size": BATCH,
        "eval_samples": EVAL_SAMPLES[model],
        "ece_bins": 10,
        "lr": LR,
        "weight_decay": WD,
        "momentum": 0.9,
        "dropout_p": DROPOUT_P,
        "prior_std": 1.0,
        "bbb_mc_samples": RANK1_MC,
        "kl_rescaling": 1.0,
        "rank1_components": RANK1_COMPONENTS,
        # the reference camelyon rank1 block passes no l2_scale ->
        # BBBOptimizer default 0 (bbb.py:47)
        "rank1_l2_scale": 0.0,
        "swag_start_epoch": SWAG_START,
        "swag_deviation_samples": SWAG_DEVIATIONS,
        # swag_interval() = spe * swag_epochs // swag_updates -> 1,
        # matching the reference update_interval=1 above
        "swag_updates": (N_TRAIN // BATCH) * (EPOCHS - SWAG_START),
        "tiny": True,
        "static_bn": True,
        "pretrained": False,
        "dataset_size": N_TRAIN,
        "seed": seed,
    }
    spe = N_TRAIN // BATCH
    built = wilds_task.build("camelyon17", config, jax.random.key(seed), spe)
    transplanted = convert_torch_state_dict(init_sd, built.state.params)
    if model == "rank1":
        # rank-1: the converter maps the shared kernels, per-component
        # bias and stacked s/r factor means; the factor rhos stay at the
        # matching -3 init on both sides (rank1.py sign_init /
        # nn/gaussian.py). Re-init posterior state on the transplanted
        # tree, as the iwildcam conv-BBB track does.
        built.state = built.method.init(
            jax.random.key(seed + 1), transplanted, built.state.model_state
        )
    else:
        built.state = built.state.replace(params=transplanted)
    from _ref_stubs import loss_capture

    log, losses = loss_capture()
    built = wilds_task.train(built, config, xtr, ytr, log=log)
    res = wilds_task.eval_task(built, "camelyon17", config, xte, yte, mte)
    return {
        "accuracy": float(res["accuracy"]),
        "avg_ll": float(res["avg_log_likelihood"]),
        "ece": float(res["ece"]),
    }, losses


@pytest.fixture(scope="module")
def arrays():
    return _make_raw_data()


# Tolerances: same initial weights on both sides; nuisances are minibatch
# order and eval-time mask/posterior-draw RNG. Calibrated in r3 against
# measured same-init cross-framework gaps at these exact settings (CPU
# backend as in CI): map acc 0.027 / ll 0.032 / ece 0.005; mcd 0.047 /
# 0.045 / 0.037; swag 0.008 / 0.011 / 0.033 — with per-epoch train
# losses tracking within 0.026 at every epoch (map/swag) over the full
# 16-epoch run. Tolerances ~2-3x observed.
_TOL = {
    "map": {"accuracy": 0.06, "avg_ll": 0.08, "ece": 0.06},
    "mcd": {"accuracy": 0.10, "avg_ll": 0.12, "ece": 0.10},
    "swag": {"accuracy": 0.07, "avg_ll": 0.10, "ece": 0.10},
    # rank1 adds per-MC-sample factor noise with unmatched RNGs (each
    # forward samples every layer's s/r factors), so its band mirrors the
    # iwildcam conv-BBB one
    "rank1": {"accuracy": 0.10, "avg_ll": 0.15, "ece": 0.10},
}


@pytest.mark.parametrize("model", ["map", "mcd", "swag", "rank1"])
def test_e2e_camelyon_parity(model, arrays, tmp_path):
    ref, init_sd, ref_losses = _run_reference(model, arrays, str(tmp_path))
    ours, our_losses = _run_ours(model, arrays, init_sd)
    print(f"[{model}] reference={ref} ours={ours}")
    print(f"[{model}] ref_losses={ref_losses}")
    print(f"[{model}] our_losses={our_losses}")
    assert np.isfinite(list(ours.values())).all()
    assert len(ref_losses) == len(our_losses) == EPOCHS
    # same-init training dynamics must track (batch order is the only
    # train-time nuisance for map/swag; dropout masks for mcd)
    for e in range(3):
        assert abs(ref_losses[e] - our_losses[e]) < 0.30, (
            f"{model}: epoch {e} train loss ref={ref_losses[e]:.3f} "
            f"ours={our_losses[e]:.3f}"
        )
    assert abs(ref_losses[-1] - our_losses[-1]) < 0.30
    # both must beat chance by a clear margin or the comparison is vacuous
    assert ref["accuracy"] > 0.6 and ours["accuracy"] > 0.6
    for key in ("accuracy", "avg_ll", "ece"):
        assert abs(ours[key] - ref[key]) < _TOL[model][key], (
            f"{model}: {key} ours={ours[key]:.4f} ref={ref[key]:.4f}"
        )
