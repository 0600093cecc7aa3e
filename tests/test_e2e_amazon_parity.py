"""END-TO-END differential parity on the Amazon/DistilBERT track: train
the LIVE reference amazon experiment loop (reference
experiments/amazon/amazon.py:119-171 train_model + :40-62 eval_model
with the real experiments/amazon/models.py builders and the real
src/architectures/bert.py BertClassifier over a real — tiny —
transformers DistilBertModel) and our experiments/wilds_task.py engine
on IDENTICAL data with matched hyperparameters, from the SAME initial
weights; assert final accuracy / posterior log-likelihood / ECE
agreement.

This is the text-track complement of the UCI / CIFAR / camelyon e2e
parity tests and covers BASELINE config #5's surface: the DistilBERT
backbone, the packed (input_ids, attention_mask) [B, L, 2] input path,
torch-Adam training, and the LAST-LAYER composition trained end to end
(ll_swag / ll_ivon / ll_svgd: LastLayerBayesianOptimizer in the
reference, last_layer_method here; ll_svgd follows the reference's
CivilComments build_ll_svgd pattern, civilcomments/models.py:109-119,
with the exact t=0 particle tensors carried over). The ll tracks pin
the backbone-gradient semantics: the reference's deterministic
optimizer accumulates EVERY inner backward pass (algo.py:100-104), so
for SVGD particles / iVON MC samples the backbone gradient is the SUM
over passes — matched via the inner methods' ``backbone_loss`` metric.

Protocol notes:
- `DistilBertModel.from_pretrained` would download weights (no egress
  here), and the reference head hardcodes 768 features (bert.py:16-20),
  so the reference-side symbol is replaced with a constructor that
  returns a REAL `transformers.DistilBertModel` with dim 768 but 1
  layer / FFN 256 / vocab 512, randomly initialized — the encoder the
  reference trains is still the live HF implementation. Ours runs the
  same shape through the `bert_config` override.
- Both frameworks start from the reference model's t=0 weights: the HF
  encoder state_dict via load_hf_weights (logit parity proven in
  tests/test_converter_parity.py::test_distilbert_logit_parity) and the
  2-layer head transplanted directly.
- mcd exercises the full-model MC-Dropout protocol (the reference's
  patch_dropout(model, False) keeps ENCODER dropouts sampling at eval,
  amazon/models.py:67-73) — reproduced by our mc_encoder_dropout flag;
  this e2e track is what surfaced that fidelity gap in r3.
- Data: synthetic 5-class token sequences whose first token carries the
  clean label, with 10% label noise — accuracy ceiling 0.9, NLL/ECE
  informative.
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

N_TRAIN, N_TEST = 256, 256
SEQ_LEN = 16
VOCAB = 512
N_CLASSES = 5  # reference amazon/models.py:17
BATCH = 16
EPOCHS = 12
LR = 3e-4
WD = 0.01
DROPOUT_P = 0.2
SWAG_START = 6
SWAG_DEVIATIONS = 8
EVAL_SAMPLES = {"map": 1, "mcd": 8, "ll_swag": 8, "ll_ivon": 8, "ll_svgd": 6}
IVON_LR, IVON_PREC = 0.05, 50.0
# civilcomments SVGD_LL block uses particle_count 5 / l2_reg 0.01
# (civil.yaml:270-280); 3 particles here for CPU speed, matched on both
# sides like every hyperparameter
SVGD_PARTICLES, SVGD_L2 = 3, 0.01
BERT_SHAPE = dict(
    vocab_size=VOCAB, dim=768, n_layers=1, n_heads=12, hidden_dim=256,
    max_position_embeddings=64,
)


def _make_raw_data():
    rng = np.random.RandomState(31)

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
        meta = r.randint(0, 20, size=(n, 1)).astype(np.int64)
        return x, y.astype(np.int64), meta

    return split(N_TRAIN, 32), split(N_TEST, 33)


# ---------------------------------------------------------------------------
# Reference-side shims
# ---------------------------------------------------------------------------


class _StubAmazonDataset:
    def __init__(self, x, y, meta, train):
        self.x, self.y, self.meta, self.train = x, y, meta, train

    def eval(self, preds, targets, metadata):
        # algorithm-free: the official metric is not part of the parity
        # assertion (our implementation has its own unit tests); the
        # reference unpacks wilds_results[0]["10th_percentile_acc"]
        return ({"10th_percentile_acc": 0.0}, "")


def _hf_tiny_config():
    return transformers.DistilBertConfig(
        vocab_size=VOCAB,
        dim=BERT_SHAPE["dim"],
        n_layers=BERT_SHAPE["n_layers"],
        n_heads=BERT_SHAPE["n_heads"],
        hidden_dim=BERT_SHAPE["hidden_dim"],
        max_position_embeddings=BERT_SHAPE["max_position_embeddings"],
        dropout=0.1,
        attention_dropout=0.1,
    )


def _install_amazon_stubs(arrays):
    from _ref_stubs import install_common_stubs, install_wilds1_stub

    install_common_stubs()

    (xtr, ytr, mtr), (xte, yte, mte) = arrays

    def tensors(x, y, m):
        return (
            torch.from_numpy(np.ascontiguousarray(x)).long(),
            torch.from_numpy(np.ascontiguousarray(y)).long(),
            torch.from_numpy(np.ascontiguousarray(m)).long(),
        )

    splits = {
        "train": tensors(xtr, ytr, mtr),
        "test": tensors(xte, yte, mte),
        "val": tensors(xte, yte, mte),
        "id_test": tensors(xtr, ytr, mtr),
    }

    def amazon_split(path, split):
        del path
        return _StubAmazonDataset(*splits[split], train=split == "train")

    def amazon_loader(dataset, batch_size, subsample=None):
        del subsample
        return torch.utils.data.DataLoader(
            torch.utils.data.TensorDataset(dataset.x, dataset.y, dataset.meta),
            batch_size=batch_size,
            shuffle=dataset.train,
            num_workers=0,
        )

    install_wilds1_stub(
        amazon_split=amazon_split, amazon_loader=amazon_loader
    )

    # from_pretrained would download; serve a REAL (randomly initialized)
    # tiny HF DistilBertModel instead — dim stays 768 because the
    # reference head hardcodes it (src/architectures/bert.py:16-20)
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
        "ll_dropout_p": DROPOUT_P,
        "last_layer_mcd": False,
        "prior_std": 1.0,
        "base_optimizer": {"lr": LR, "weight_decay": WD},
        "transformer_optimizer": {"lr": LR, "weight_decay": WD},
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
        "svgd": {
            "particle_count": SVGD_PARTICLES,
            "l2_reg": SVGD_L2,
            "dataset_size": N_TRAIN,
            "kernel_grad_scale": 1.0,
        },
    }


def _run_reference(model: str, arrays, tmpdir: str, seed: int = 1):
    import copy

    _install_amazon_stubs(arrays)
    import experiments.amazon.models as ref_models
    import experiments.amazon.amazon as ref_amazon

    torch.manual_seed(seed)
    device = torch.device("cpu")
    config = _ref_config(model)
    extras = {}
    if model == "ll_svgd":
        # Amazon has no ll_svgd builder; construct it exactly as the
        # reference's CivilComments build_ll_svgd does
        # (civilcomments/models.py:109-119) around Amazon's 5-class
        # BertClassifier: SVGD over the classifier head, deterministic
        # Adam on the transformer, joined by LastLayerBayesianOptimizer.
        import torch.nn as nn

        from src.algos.algo import LastLayerBayesianOptimizer
        from src.algos.ensemble import DeepEnsemble
        from src.algos.svgd import SVGDOptimizer
        from src.algos.util import reset_model_params
        from src.architectures.bert import BertClassifier

        m = nn.Sequential(
            BertClassifier("map", ref_models.N_CLASSES), nn.LogSoftmax(dim=1)
        ).to(device)

        def reset_model():
            reset_model_params(m[0].classifier)

        head_opt = SVGDOptimizer(
            ref_models.get_params(m, config, "head"),
            reset_model,
            torch.optim.Adam(
                ref_models.get_params(m, config, "head"),
                **config["base_optimizer"],
            ),
            **config["svgd"],
        )
        optimizer = LastLayerBayesianOptimizer(
            head_opt,
            torch.optim.Adam(
                ref_models.get_params(m, config, "transformer"),
                **config["transformer_optimizer"],
            ),
        )
        ensemble = DeepEnsemble([(m, optimizer)])
        # The reference draws each particle by RE-INITIALIZING the head
        # (svgd.py:58-63 reset between clones), so the particle tensors —
        # not the live state_dict — are the t=0 head weights; export them
        # for the transplant (ordered over head params per particle).
        extras["svgd_particles"] = [
            [p.detach().numpy().copy() for p in head_opt._params_for_particle(i)]
            for i in range(SVGD_PARTICLES)
        ]
    else:
        ensemble = ref_models.get_model(model, config, device)
    init_sd = copy.deepcopy(ensemble.models_and_optimizers[0][0].state_dict())
    from _ref_stubs import RecordLog

    log = RecordLog()
    ref_amazon.train_model(ensemble, device, config, log, tmpdir.rstrip("/") + "/")
    res = ref_amazon.eval_model(ensemble, config, device, split="test")
    return {
        "accuracy": float(res["accuracy"]),
        "avg_ll": float(res["log_likelihood"]),
        "ece": float(res["ece"]),
    }, init_sd, log.losses, extras


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------


def _transplant(init_sd, params, tmp_path):
    """t=0 reference weights -> our param tree: the HF encoder via
    load_hf_weights (parity-proven converter), the 2-layer head directly.
    init_sd keys: '0.bert.embeddings...', '0.classifier.{0,3}.{weight,bias}'."""
    import jax.numpy as jnp

    from beyond_deep_ensembles_tpu.models.bert import load_hf_weights

    bert_sd = {
        k[len("0.bert."):]: v for k, v in init_sd.items() if k.startswith("0.bert.")
    }
    ckpt = tmp_path / "hf"
    os.makedirs(ckpt, exist_ok=True)
    torch.save(bert_sd, ckpt / "pytorch_model.bin")
    params = load_hf_weights(params, str(ckpt))

    def dense(prefix):
        w = np.asarray(init_sd[f"0.classifier.{prefix}.weight"].numpy(), np.float32)
        b = np.asarray(init_sd[f"0.classifier.{prefix}.bias"].numpy(), np.float32)
        return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}

    heads = [k for k in params if k != "bert"]
    assert len(heads) == 2, heads
    params = dict(params)
    params[heads[0]] = dense(0)
    params[heads[1]] = dense(3)
    return params


def _run_ours(model: str, arrays, init_sd, tmp_path, seed: int = 0, extras=None):
    import jax

    from beyond_deep_ensembles_tpu.experiments import wilds_task

    (xtr, ytr, _), (xte, yte, mte) = arrays
    our_name = {"ll_swag": "swag_ll"}.get(model, model)
    config = {
        **wilds_task.DEFAULT_CONFIG,
        "model": our_name,
        "members": 1,
        "epochs": EPOCHS,
        "batch_size": BATCH,
        "eval_batch_size": BATCH,
        "eval_samples": EVAL_SAMPLES[model],
        "ece_bins": 10,
        "optimizer_kind": "adam",
        "lr": LR,
        "weight_decay": WD,
        "dropout_p": DROPOUT_P if model == "mcd" else None,
        "prior_std": 1.0,
        "swag_start_epoch": SWAG_START,
        "swag_deviation_samples": SWAG_DEVIATIONS,
        "swag_updates": (N_TRAIN // BATCH) * (EPOCHS - SWAG_START),
        "ivon_lr": IVON_LR,
        "ivon_prior_prec": IVON_PREC,
        "ivon_mc_samples": 2,
        "ivon_damping": 0.001,
        "svgd_particles": SVGD_PARTICLES,
        "svgd_reg_scale": SVGD_L2,
        "bert_config": BERT_SHAPE,
        "train_all_layers": True,
        "pretrained": False,
        "dataset_size": N_TRAIN,
        "seed": seed,
    }
    spe = N_TRAIN // BATCH
    built = wilds_task.build("amazon", config, jax.random.key(seed), spe)
    # Re-init the method on the transplanted t=0 params — works for flat
    # states AND the last-layer state (backbone/head split happens in
    # init; at t=0 the optimizer/posterior state is all zeros anyway).
    built.state = built.method.init(
        jax.random.key(seed + 1),
        _transplant(init_sd, built.state.params, tmp_path),
        built.state.model_state,
    )
    if model == "ll_svgd":
        # inject the reference's exact t=0 particle tensors into the
        # stacked head (our init jitters them; the reference draws each
        # by re-initializing the torch head — unmatched RNGs, so the
        # tensors must be carried over for a same-init comparison)
        import jax.numpy as jnp

        particles = extras["svgd_particles"]

        def stack_for(leaf):
            if leaf.size == 0:  # masked-out backbone position
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
    res = wilds_task.eval_task(built, "amazon", config, xte, yte, mte)
    return {
        "accuracy": float(res["accuracy"]),
        "avg_ll": float(res["avg_log_likelihood"]),
        "ece": float(res["ece"]),
    }, losses


@pytest.fixture(scope="module")
def arrays():
    return _make_raw_data()


# Tolerances: same t=0 weights; nuisances are batch order, train-time
# dropout masks (both sides sample their own), and eval-time RNG.
# Calibrated against measured same-init cross-framework gaps (r3, CPU):
# map acc 0.004 / ll 0.047 / ece 0.001; mcd 0.004 / 0.019 / 0.011;
# ll_swag 0.000 / 0.024 / 0.011; ll_ivon 0.000 / 0.069 / 0.014 —
# per-epoch train losses tracking within 0.05 from epoch 1 on (25% of
# scale for iVON's O(10) early noisy-MC loss). Tolerances ~3x observed.
_TOL = {
    "map": {"accuracy": 0.05, "avg_ll": 0.15, "ece": 0.06},
    "mcd": {"accuracy": 0.05, "avg_ll": 0.15, "ece": 0.06},
    "ll_swag": {"accuracy": 0.05, "avg_ll": 0.15, "ece": 0.06},
    # ll_ivon: both frameworks draw weight noise per MC sample with
    # unmatched RNGs, so outcomes carry intrinsic seed noise. Measured r3
    # across OUR seeds 0/1/2 at fixed ref: accuracy 0.87-0.93 (range
    # 0.059), avg_ll -0.88..-1.25 (range 0.37), ece 0.10-0.13 — the
    # tolerances must cover that spread to not be a seed lottery, and
    # still reject systematic failures (an unregularized head moves
    # avg_ll by >1 here).
    "ll_ivon": {"accuracy": 0.08, "avg_ll": 0.40, "ece": 0.10},
    # ll_svgd: LastLayer+SVGD composition (reference civilcomments
    # build_ll_svgd pattern); same t=0 weights incl. the exact particle
    # tensors. Measured r3 same-init gap: acc 0.000 / ll 0.010 /
    # ece 0.0003, train losses tracking within 0.07
    "ll_svgd": {"accuracy": 0.05, "avg_ll": 0.15, "ece": 0.06},
}


@pytest.mark.parametrize("model", ["map", "mcd", "ll_swag", "ll_ivon", "ll_svgd"])
def test_e2e_amazon_parity(model, arrays, tmp_path):
    ref, init_sd, ref_losses, extras = _run_reference(model, arrays, str(tmp_path))
    ours, our_losses = _run_ours(model, arrays, init_sd, tmp_path, extras=extras)
    print(f"[{model}] reference={ref} ours={ours}")
    print(f"[{model}] ref_losses={ref_losses}")
    print(f"[{model}] our_losses={our_losses}")
    assert np.isfinite(list(ours.values())).all()
    assert len(ref_losses) == len(our_losses) == EPOCHS
    # scale-aware tracking bound: iVON's reported loss starts at O(10)
    # (mean over noisy MC samples at the early noise level), the others
    # at O(0.6)
    for e in (0, 1, 2, EPOCHS - 1):
        bound = max(0.40, 0.25 * abs(ref_losses[e]))
        assert abs(ref_losses[e] - our_losses[e]) < bound, (
            f"{model}: epoch {e} train loss ref={ref_losses[e]:.3f} "
            f"ours={our_losses[e]:.3f}"
        )
    # the signal token makes the task learnable: both must beat chance
    # (0.2) clearly or the comparison is vacuous
    assert ref["accuracy"] > 0.5 and ours["accuracy"] > 0.5
    for key in ("accuracy", "avg_ll", "ece"):
        assert abs(ours[key] - ref[key]) < _TOL[model][key], (
            f"{model}: {key} ours={ours[key]:.4f} ref={ref[key]:.4f}"
        )
