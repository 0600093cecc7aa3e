"""END-TO-END differential parity on the CivilComments track: train the
LIVE reference civilcomments experiment loop (reference
experiments/civilcomments/civil.py:124-180 train_model + :53-89
eval_model/eval_all_groups with the real
experiments/civilcomments/models.py builders) and our
experiments/wilds_task.py engine on IDENTICAL data with matched
hyperparameters from the SAME initial weights; assert final accuracy /
posterior log-likelihood / ECE / WORST-GROUP accuracy agreement.

This is the track VERDICT r3 flagged missing: the shared DistilBERT
engine is exercised by the Amazon e2e, but civilcomments' own loop —
2-class head (civilcomments/models.py:50 BertClassifier("map", 2)),
the per-identity-group fairness eval threaded through training output
(civil.py:22-89 get_group/eval_group/eval_all_groups), and its native
build_ll_svgd composition (models.py:108-118) — never ran against us
end to end. The 300-token transform itself is data staging, covered
hermetically by tests/test_raw_formats.py; here a short sequence keeps
the CPU-bound differential tractable, matched on both sides like every
other hyperparameter.

Protocol: identical to tests/test_e2e_amazon_parity.py (whose
_transplant/BERT_SHAPE/stub machinery this reuses) — tiny REAL HF
DistilBertModel on the reference side, bert_config-matched flax encoder
on ours, t=0 state_dict transplant, synthetic 2-class token sequences
with a class-signal token + 10% label noise, and 8 binary identity
columns of group metadata.
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
transformers = pytest.importorskip("transformers")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from test_e2e_amazon_parity import (  # noqa: E402  (same-dir test helpers)
    BERT_SHAPE,
    _hf_tiny_config,
    _transplant,
)

N_TRAIN, N_TEST = 256, 384
SEQ_LEN = 16
VOCAB = 512
N_CLASSES = 2  # reference civilcomments/models.py:50
BATCH = 16
EPOCHS = 10
LR = 3e-4
WD = 0.01
EVAL_SAMPLES = {"map": 1, "ll_svgd": 6}
# civil.yaml SVGD_LL block: particle_count 5 / l2_reg 0.01
# (civil.yaml SVGD_LL); 3 particles here for CPU speed, matched both sides
SVGD_PARTICLES, SVGD_L2 = 3, 0.01
N_GROUPS = 8  # reference civil.py:22-31 GROUP_INDICES


def _make_raw_data():
    def split(n, seed):
        r = np.random.RandomState(seed)
        y_clean = r.randint(0, N_CLASSES, size=n)
        ids = r.randint(6, VOCAB, size=(n, SEQ_LEN)).astype(np.int64)
        ids[:, 0] = y_clean + 1  # class signal token
        y = y_clean.copy()
        flip = r.rand(n) < 0.1
        y[flip] = r.randint(0, N_CLASSES, size=flip.sum())
        mask = np.ones_like(ids)
        x = np.stack([ids, mask], axis=-1)  # [n, L, 2] packed
        # 8 binary identity columns, ~25% membership each: every
        # group x toxic/non-toxic cell is populated at N_TEST=384
        meta = r.binomial(1, 0.25, size=(n, N_GROUPS)).astype(np.int64)
        return x, y.astype(np.int64), meta

    return split(N_TRAIN, 41), split(N_TEST, 42)


def _install_civil_stubs(arrays):
    from _ref_stubs import install_common_stubs, install_wilds1_stub

    install_common_stubs()

    (xtr, ytr, mtr), (xte, yte, mte) = arrays

    def tensors(x, y, m):
        return (
            torch.from_numpy(np.ascontiguousarray(x)).long(),
            torch.from_numpy(np.ascontiguousarray(y)).long(),
            torch.from_numpy(np.ascontiguousarray(m)).long(),
        )

    def loader(x, y, m, shuffle):
        return torch.utils.data.DataLoader(
            torch.utils.data.TensorDataset(*tensors(x, y, m)),
            batch_size=BATCH,
            shuffle=shuffle,
            num_workers=0,
        )

    def civil_comments_trainloader(path, batch_size, val=False, subsample=None):
        del path, batch_size, subsample
        if val:
            return loader(xte, yte, mte, shuffle=False)
        return loader(xtr, ytr, mtr, shuffle=True)

    def civil_comments_testloader(path, batch_size, subsample=None):
        del path, batch_size, subsample
        return loader(xte, yte, mte, shuffle=False)

    install_wilds1_stub(
        civil_comments_trainloader=civil_comments_trainloader,
        civil_comments_testloader=civil_comments_testloader,
    )

    import src.architectures.bert as ref_bert

    class _TinyPretrained:
        @staticmethod
        def from_pretrained(name):
            del name
            return transformers.DistilBertModel(_hf_tiny_config())

    ref_bert.DistilBertModel = _TinyPretrained


def _ref_config(model: str) -> dict:
    return {
        "model": model,
        "members": 1,
        "epochs": EPOCHS,
        "batch_size": BATCH,
        "eval_samples": EVAL_SAMPLES[model],
        "ece_bins": 10,
        "use_amp": False,
        "eval_while_train": False,
        "disable_wandb": True,
        "data_path": "",
        "subsample": None,
        "test_subsample": None,
        "train_all_layers": True,
        "prior_std": 1.0,
        "base_optimizer": {"lr": LR, "weight_decay": WD},
        "transformer_optimizer": {"lr": LR, "weight_decay": WD},
        "svgd": {
            "particle_count": SVGD_PARTICLES,
            "l2_reg": SVGD_L2,
            "dataset_size": N_TRAIN,
            "kernel_grad_scale": 1.0,
        },
    }


def _run_reference(model: str, arrays, tmpdir: str, seed: int = 1):
    import copy

    _install_civil_stubs(arrays)
    import experiments.civilcomments.civil as ref_civil
    import experiments.civilcomments.models as ref_models

    torch.manual_seed(seed)
    device = torch.device("cpu")
    config = _ref_config(model)
    ensemble = ref_models.get_model(model, config, device)
    extras = {}
    if model == "ll_svgd":
        # the reference draws each SVGD particle by re-initializing the
        # torch head (svgd.py reset between clones): export the t=0
        # particle tensors for the transplant
        head_opt = ensemble.models_and_optimizers[0][1].ll_bayesian_optimizer
        extras["svgd_particles"] = [
            [p.detach().numpy().copy() for p in head_opt._params_for_particle(i)]
            for i in range(SVGD_PARTICLES)
        ]
    init_sd = copy.deepcopy(ensemble.models_and_optimizers[0][0].state_dict())
    from _ref_stubs import RecordLog

    log = RecordLog()
    ref_civil.train_model(ensemble, device, config, log, tmpdir.rstrip("/") + "/")
    testloader = ref_civil.wilds1.civil_comments_testloader(
        config["data_path"], config["batch_size"]
    )
    groups = ref_civil.eval_all_groups(ensemble, testloader, config, device)
    return (
        {
            "accuracy": float(groups["all"]["accuracy"]),
            "avg_ll": float(groups["all"]["log_likelihood"]),
            "ece": float(groups["all"]["ece"]),
            "worst_group_acc": float(groups["worst group accuracy"]),
        },
        init_sd,
        log.losses,
        extras,
    )


def _run_ours(model: str, arrays, init_sd, tmp_path, seed: int = 0, extras=None):
    import jax

    from beyond_deep_ensembles_tpu.experiments import wilds_task

    (xtr, ytr, _), (xte, yte, mte) = arrays
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
        "prior_std": 1.0,
        "svgd_particles": SVGD_PARTICLES,
        "svgd_reg_scale": SVGD_L2,
        "bert_config": BERT_SHAPE,
        "train_all_layers": True,
        "pretrained": False,
        "dataset_size": N_TRAIN,
        "seed": seed,
    }
    spe = N_TRAIN // BATCH
    built = wilds_task.build("civilcomments", config, jax.random.key(seed), spe)
    built.state = built.method.init(
        jax.random.key(seed + 1),
        _transplant(init_sd, built.state.params, tmp_path),
        built.state.model_state,
    )
    if model == "ll_svgd":
        import jax.numpy as jnp

        particles = extras["svgd_particles"]

        def stack_for(leaf):
            if leaf.size == 0:
                return leaf
            rest = tuple(leaf.shape[1:])
            out = []
            for plist in particles:
                hit = None
                for arr in plist:
                    cand = arr.T if arr.ndim == 2 else arr
                    if tuple(cand.shape) == rest:
                        hit = cand
                        break
                assert hit is not None, f"no particle tensor of shape {rest}"
                out.append(hit)
            return jnp.asarray(np.stack(out), leaf.dtype)

        inner = built.state.inner
        new_head = jax.tree.map(stack_for, inner.params)
        built.state = built.state.replace(inner=inner.replace(params=new_head))
    from _ref_stubs import loss_capture

    log, losses = loss_capture()
    built = wilds_task.train(built, config, xtr, ytr, log=log)
    res = wilds_task.eval_task(built, "civilcomments", config, xte, yte, mte)
    return {
        "accuracy": float(res["accuracy"]),
        "avg_ll": float(res["avg_log_likelihood"]),
        "ece": float(res["ece"]),
        "worst_group_acc": float(res["worst_group_acc"]),
    }, losses


@pytest.fixture(scope="module")
def arrays():
    return _make_raw_data()


# Tolerances: same t=0 weights; nuisances are batch order, train-time
# dropout masks and eval RNG. worst_group_acc is a MIN over ~19 cells of
# ~100 examples each, so it carries more sampling noise than the
# aggregate accuracy.
_TOL = {
    "map": {"accuracy": 0.05, "avg_ll": 0.15, "ece": 0.06, "worst_group_acc": 0.10},
    "ll_svgd": {"accuracy": 0.05, "avg_ll": 0.15, "ece": 0.06, "worst_group_acc": 0.10},
}


@pytest.mark.parametrize("model", ["map", "ll_svgd"])
def test_e2e_civilcomments_parity(model, arrays, tmp_path):
    ref, init_sd, ref_losses, extras = _run_reference(model, arrays, str(tmp_path))
    ours, our_losses = _run_ours(model, arrays, init_sd, tmp_path, extras=extras)
    print(f"[{model}] reference={ref} ours={ours}")
    print(f"[{model}] ref_losses={ref_losses}")
    print(f"[{model}] our_losses={our_losses}")
    assert np.isfinite(list(ours.values())).all()
    assert len(ref_losses) == len(our_losses) == EPOCHS
    for e in (0, 1, EPOCHS - 1):
        bound = max(0.30, 0.25 * abs(ref_losses[e]))
        assert abs(ref_losses[e] - our_losses[e]) < bound, (
            f"{model}: epoch {e} train loss ref={ref_losses[e]:.3f} "
            f"ours={our_losses[e]:.3f}"
        )
    # the signal token makes the task learnable: both must beat chance
    # (0.5) clearly or the comparison is vacuous
    assert ref["accuracy"] > 0.7 and ours["accuracy"] > 0.7
    for key in ("accuracy", "avg_ll", "ece", "worst_group_acc"):
        assert abs(ours[key] - ref[key]) < _TOL[model][key], (
            f"{model}: {key} ours={ours[key]:.4f} ref={ref[key]:.4f}"
        )
