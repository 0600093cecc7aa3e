"""END-TO-END differential parity on the PovertyMap regression track:
train the LIVE reference poverty experiment loop (reference
experiments/poverty/poverty.py:86-160 train_model + :20-52 eval_model
with the real experiments/poverty/models.py builders — from-scratch
ResNet18 with 8 input channels + GaussLayer, src/architectures/
resnet.py:150-176, src/algos/util.py:66-88) and our
experiments/wilds_task.py engine on IDENTICAL data with matched
hyperparameters, from the SAME initial weights; assert final avg-LL /
MSE / QCE agreement.

The WILDS-regression complement of the other e2e tracks: multispectral
(8-channel) images, the heteroscedastic (mean, std) GaussLayer output
pair, Gaussian-NLL training (util.py:17-24 clamp semantics), and
RegressionResults-style sampled-quantile eval through the engine.

Protocol notes (mirroring tests/test_e2e_camelyon_parity.py):
- ResNet18 is full-width on both sides (both hardcode the 64..512
  widths); images are 16x16x8 so torch CPU stays tractable.
- Static BN both sides (batch stats at eval); eval unshuffled with the
  same batch size on both sides so BN sees identical batches.
- learn_var=False with matched init_std: the reference trains a learned
  GaussLayer rho with a SEPARATE SGD var_optimizer (poverty.py:104-141)
  while our engine trains it with the base optimizer — a genuinely
  different (and documented) optimizer split, excluded from the matched
  protocol here; the learned-rho path is covered by the UCI track where
  both frameworks use the same per-parameter optimizer.
- Both frameworks start from the reference's t=0 state_dict via
  convert_torch_state_dict (bucket order proven by the ResNet20/
  DenseNet transplant parity tests).
- Data: y = linear readout of per-channel means + noise, standardized —
  learnable but noisy, so NLL/QCE are informative.
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

N_TRAIN, N_TEST = 256, 128
IMG = 16
BATCH = 32
EPOCHS = 10
LR = 1e-3
INIT_STD = 0.25
SWAG_START = 5
SWAG_DEVIATIONS = 6
EVAL_SAMPLES = {"map": 1, "swag": 8}


def _make_raw_data():
    """Per-sample channel offsets carry the signal (a 16x16 iid-noise
    image's channel mean has std 1/16 — no learnable signal); y is a
    linear readout of the offsets plus noise, so the Bayes MSE is ~0.1
    and overfit shows up as test MSE >> that."""
    w = np.random.RandomState(99).randn(8).astype(np.float32)
    w /= np.linalg.norm(w)

    def split(n, seed):
        r = np.random.RandomState(seed)
        c = r.randn(n, 8).astype(np.float32)
        x = c[:, None, None, :] + 0.5 * r.randn(n, IMG, IMG, 8).astype(np.float32)
        y = c @ w + 0.3 * r.randn(n).astype(np.float32)
        y = (y - y.mean()) / y.std()
        meta = r.randint(0, 2, size=(n, 1)).astype(np.int64)  # urban flag
        return x.astype(np.float32), y.astype(np.float32).reshape(n, 1), meta

    return split(N_TRAIN, 41), split(N_TEST, 42)


class _StubPovertyDataset:
    def __init__(self, x, y, meta, train):
        self.x, self.y, self.meta, self.train = x, y, meta, train

    def eval(self, preds, targets, metadata):
        # algorithm-free: the official worst-urban/rural Pearson is unit-
        # tested separately (data/wilds.py); the reference unpacks
        # wilds_result[0]['r_urban:{0,1}']
        return ({"r_urban:0": 0.0, "r_urban:1": 0.0}, "")


def _install_poverty_stubs(arrays):
    from _ref_stubs import install_common_stubs, install_wilds1_stub

    install_common_stubs()

    (xtr, ytr, mtr), (xte, yte, mte) = arrays

    def tensors(x, y, m):
        return (
            torch.from_numpy(np.ascontiguousarray(x)).permute(0, 3, 1, 2),
            torch.from_numpy(np.ascontiguousarray(y)).float(),
            torch.from_numpy(np.ascontiguousarray(m)).long(),
        )

    splits = {
        "train": tensors(xtr, ytr, mtr),
        "test": tensors(xte, yte, mte),
        "val": tensors(xte, yte, mte),
        "id_test": tensors(xtr, ytr, mtr),
        "id_val": tensors(xtr, ytr, mtr),
    }

    def poverty_split(path, split, fold=None):
        del path, fold
        return _StubPovertyDataset(*splits[split], train=split == "train")

    def poverty_loader(dataset, batch_size, subsample=None):
        del subsample
        return torch.utils.data.DataLoader(
            torch.utils.data.TensorDataset(dataset.x, dataset.y, dataset.meta),
            batch_size=batch_size,
            shuffle=dataset.train,
            num_workers=0,
        )

    install_wilds1_stub(
        poverty_split=poverty_split, poverty_loader=poverty_loader
    )

    # poverty.py does `from models import get_model, ...` (bare name,
    # resolved from its own directory when run as a script)
    import experiments.poverty.models as poverty_models

    sys.modules["models"] = poverty_models


def _ref_config(model: str) -> dict:
    return {
        "model": model,
        "members": 1,
        "fold": "A",
        "epochs": EPOCHS,
        "batch_size": BATCH,
        "eval_samples": EVAL_SAMPLES[model],
        "use_amp": False,
        "train_on_val": False,
        "eval_while_train": False,
        "move_model": False,
        "data_path": "",
        "subsample": None,
        "test_subsample": None,
        "learn_var": False,
        "init_std": INIT_STD,
        "lr_decay": 1.0,
        "base_optimizer": {"lr": LR, "weight_decay": 0.0},
        "swag": {
            "start_epoch": SWAG_START,
            "update_interval": 1,
            "deviation_samples": SWAG_DEVIATIONS,
        },
    }


def _run_reference(model: str, arrays, tmpdir: str, seed: int = 1):
    import copy

    _install_poverty_stubs(arrays)
    import experiments.poverty.models as ref_models
    import experiments.poverty.poverty as ref_poverty

    torch.manual_seed(seed)
    device = torch.device("cpu")
    config = _ref_config(model)
    ensemble = ref_models.get_model(model, device, config)
    init_sd = copy.deepcopy(ensemble.models_and_optimizers[0][0].state_dict())
    from _ref_stubs import RecordLog

    log = RecordLog()
    ref_poverty.train_model(ensemble, device, config, log, tmpdir.rstrip("/") + "/")
    res = ref_poverty.eval_model(ensemble, "test", device, config, log)
    return {
        "avg_ll": float(res["avg_ll"]),
        "mse": float(res["mse"]),
        "qce": float(res["qce"]),
    }, init_sd, log.losses


def _run_ours(model: str, arrays, init_sd, seed: int = 0):
    import jax

    from beyond_deep_ensembles_tpu.experiments import wilds_task
    from beyond_deep_ensembles_tpu.models.torch_convert import (
        convert_torch_state_dict,
    )

    (xtr, ytr, _), (xte, yte, mte) = arrays
    config = {
        **wilds_task.DEFAULT_CONFIG,
        "model": model,
        "members": 1,
        "epochs": EPOCHS,
        "batch_size": BATCH,
        "eval_batch_size": BATCH,
        "eval_samples": EVAL_SAMPLES[model],
        "optimizer_kind": "adam",
        "lr": LR,
        "weight_decay": 0.0,
        "learn_var": False,
        "init_std": INIT_STD,
        "swag_start_epoch": SWAG_START,
        "swag_deviation_samples": SWAG_DEVIATIONS,
        "swag_updates": (N_TRAIN // BATCH) * (EPOCHS - SWAG_START),
        "static_bn": True,
        "pretrained": False,
        "dataset_size": N_TRAIN,
        "seed": seed,
    }
    spe = N_TRAIN // BATCH
    built = wilds_task.build("poverty", config, jax.random.key(seed), spe)
    built.state = built.method.init(
        jax.random.key(seed + 1),
        convert_torch_state_dict(init_sd, built.state.params),
        built.state.model_state,
    )
    from _ref_stubs import loss_capture

    log, losses = loss_capture()
    built = wilds_task.train(built, config, xtr, ytr, log=log)
    res = wilds_task.eval_task(built, "poverty", config, xte, yte, mte)
    return {
        "avg_ll": float(res["avg_ll"]),
        "mse": float(res["mse"]),
        "qce": float(res["qce"]),
    }, losses


@pytest.fixture(scope="module")
def arrays():
    return _make_raw_data()


# Tolerances: same t=0 weights; nuisances are batch order and (for swag)
# eval-time posterior-draw RNG. Measured same-init cross-framework gaps
# at these exact settings (r3, CPU backend): map ll 0.27 / mse 0.034 /
# qce 0.0; swag ll 0.003 / mse 0.005 / qce 0.066. map's avg-LL amplifies
# its mse gap by 1/(2 sigma^2) = 8x at the fixed sigma=0.25 (0.27 ==
# 8 x 0.034), so its tolerance is mse_tol-derived rather than
# independent. Tolerances ~2x observed.
_TOL = {
    "map": {"avg_ll": 0.60, "mse": 0.075, "qce": 0.10},
    "swag": {"avg_ll": 0.60, "mse": 0.075, "qce": 0.15},
}


@pytest.mark.parametrize("model", ["map", "swag"])
def test_e2e_poverty_parity(model, arrays, tmp_path):
    ref, init_sd, ref_losses = _run_reference(model, arrays, str(tmp_path))
    ours, our_losses = _run_ours(model, arrays, init_sd)
    print(f"[{model}] reference={ref} ours={ours}")
    print(f"[{model}] ref_losses={ref_losses}")
    print(f"[{model}] our_losses={our_losses}")
    assert np.isfinite(list(ours.values())).all()
    assert len(ref_losses) == len(our_losses) == EPOCHS
    # relative tracking: the Gaussian NLL starts at O(10) with the tight
    # fixed init_std, so use a scale-aware bound
    for e in (0, 1, 2, EPOCHS - 1):
        bound = max(0.40, 0.30 * abs(ref_losses[e]))
        assert abs(ref_losses[e] - our_losses[e]) < bound, (
            f"{model}: epoch {e} train loss ref={ref_losses[e]:.3f} "
            f"ours={our_losses[e]:.3f}"
        )
    # both must clearly beat the trivial predictor (std-normal targets:
    # mse 1.0) or the comparison is vacuous
    assert ref["mse"] < 0.7 and ours["mse"] < 0.7
    for key in ("avg_ll", "mse", "qce"):
        assert abs(ours[key] - ref[key]) < _TOL[model][key], (
            f"{model}: {key} ours={ours[key]:.4f} ref={ref[key]:.4f}"
        )
