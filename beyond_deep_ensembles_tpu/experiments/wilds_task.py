"""Generic WILDS experiment runner — one engine for all seven tasks.

The reference repeats one template per task directory
(experiments/{camelyon,iwildcam,fmow,rxrx1,amazon,civilcomments,poverty},
SURVEY.md §2.5): per-algorithm model/optimizer builders, a train loop,
WILDS official eval, plus last-layer variants (swag_ll / ll_ivon /
ll_svgd / ll_bbb, reference iwildcam/models.py:87-154) and post-hoc
Laplace. Here a task registry supplies the backbone and loss; every
algorithm builder is shared.

Backbones: camelyon/fmow -> from-scratch DenseNet-121; iwildcam/rxrx1 ->
ResNet-50; poverty -> ResNet-18 (8 input channels) + GaussLayer
regression; civilcomments/amazon -> DistilBERT classifier. The reference
used torchvision/HF *pretrained* weights for iwildcam/fmow/rxrx1/bert
(SURVEY.md §2.2); weight conversion hooks exist (models/bert.py
load_hf_weights) and random init is used when no checkpoint is on disk.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import wilds as wilds_data
from ..data.native_loader import PrefetchLoader
from ..evals.classification import EvalResult, analyze_output, bayesian_model_average
from ..evals.regression import RegressionResults, nll_loss
from ..methods import (
    GaussianPrior,
    LossOutput,
    bbb_method,
    deep_ensemble,
    ivon_method,
    laplace_method,
    last_layer_method,
    map_method,
    predict,
    sngp_method,
    svgd_method,
    swag_method,
)
from ..methods.api import PosteriorMethod
from ..models.bert import TINY_CONFIG, BertClassifier, DistilBertConfig
from ..models.densenet import DenseNetClassifier
from ..models.resnet import ResNet18, ResNet50
from ..nn.base import Model
from ..nn.gauss import GaussLayer
from ..nn.sngp import SNGPHead
from ..tree import tree_stack

DEFAULT_CONFIG = {
    "batch_size": 32,
    "eval_batch_size": 64,
    "epochs": 5,
    "eval_samples": 10,
    "ece_bins": 10,
    "members": 1,
    "lr": 1e-3,
    "weight_decay": 0.0,
    "momentum": 0.9,
    "subsample": None,
    "test_subsample": None,
    "seed": 0,
    "dropout_p": 0.1,
    "prior_std": 1.0,
    "bbb_mc_samples": 1,
    "kl_rescaling": 1.0,
    "swag_deviation_samples": 30,
    "swag_start_epoch": 2,
    "swag_updates": 50,
    "svgd_particles": 3,
    "svgd_reg_scale": 1e-4,
    "ivon_lr": 1e-4,
    "ivon_prior_prec": 50,
    "ivon_mc_samples": 2,
    "rank1_components": 2,
    "rank1_l2_scale": 1e-4,
    "sngp": {"num_random_features": 512, "ridge_penalty": 0.001,
             "mean_field_factor": 0.25, "feature_scale": 2.0},
    "spectral_norm_bound": 6.0,
    "ll_hessian": "full",
    "tiny": False,  # shrink backbones for tests/CI
    "static_bn": True,  # batch stats at eval (reference static_bn patch)
}


def _bert_config(config: dict) -> DistilBertConfig:
    """DistilBERT architecture: base shape by default, TINY_CONFIG under
    the `tiny` test knob, or an explicit `bert_config` dict override
    (e.g. the e2e parity track matches a shrunken torch DistilBertModel
    whose head dims the reference hardcodes at 768, bert.py:16-20)."""
    override = config.get("bert_config")
    if override:
        return DistilBertConfig(**override)
    if config.get("tiny"):
        return TINY_CONFIG
    # bert_remat: recompute each transformer block in backward instead of
    # saving activations (models/bert.py DistilBertConfig.remat) — wins
    # when the train step is HBM-bound (see benchmarks big_backbones)
    return DistilBertConfig(remat=bool(config.get("bert_remat", False)))


def _compute_dtype(config: dict):
    """TPU compute dtype: the reference trains its big backbones under
    torch AMP fp16 + GradScaler (algo.py:44-80); the TPU-native policy is
    bf16 compute with fp32 parameters and no scaler (SURVEY.md §7 "bf16
    policy"). Opt in with config compute_dtype: bf16 — parity tests and
    small models default to fp32."""
    return (
        jnp.bfloat16
        if config.get("compute_dtype", "fp32") in ("bf16", "bfloat16")
        else None
    )


def _make_backbone(task: str, config: dict, kind: str, dropout_p=None, head_kind=None) -> Model:
    tiny = config.get("tiny", False)
    spec = wilds_data.TASKS[task]
    components = config.get("rank1_components", 1)
    dtype = _compute_dtype(config)
    if task in ("camelyon17", "fmow"):
        return Model(
            DenseNetClassifier(
                classes=spec.classes,
                growth_rate=4 if tiny else 32,
                block_config=(2, 2) if tiny else (6, 12, 24, 16),
                init_features=8 if tiny else 64,
                bn_size=2 if tiny else 4,
                conv_kind=kind,
                head_kind=head_kind or kind,
                components=components,
                dropout_p=dropout_p,
                track_running_stats=not config.get("static_bn", True),
                # camelyon's from-scratch DenseNet keeps the reference
                # frozen-mask eval default; fmow's pretrained-densenet
                # protocol uses proper rescaled eval dropout
                # (fmow/models.py:73 freeze_on_eval=False)
                dropout_freeze_eval=task == "camelyon17",
                dtype=dtype,
                # remat A/Bs measured in benchmarks/big_backbones
                # densenet121_map_remat_* rows (block loses, layer ~4%
                # win); default none for parity
                remat=config.get("conv_remat", "none"),
                # exact cross-layer BN-stat reuse (models/densenet.py);
                # A/B row densenet121_map_noincbn
                incremental_bn=config.get("densenet_incremental_bn", True),
                # benchmark decomposition only: *_nonorm rows measure the
                # norm/elementwise share of the step (never a default)
                norm_off=config.get("no_norm", False),
                # 'concat' | 'buffer' dense-block growth (exact either
                # way; measured A/B big_backbones densenet121_map_buffer)
                concat_mode=config.get("densenet_concat_mode", "concat"),
            )
        )
    if task in ("iwildcam", "rxrx1"):
        cls = ResNet50
        return Model(
            cls(
                classes=spec.classes,
                norm=(
                    "none"  # benchmark decomposition only (*_nonorm rows)
                    if config.get("no_norm")
                    else "batch_static" if config.get("static_bn", True) else "frn"
                ),
                conv_kind=kind,
                head_kind=head_kind,
                components=components,
                dropout_p=dropout_p,
                stage_sizes=(1, 1) if tiny else (3, 4, 6, 3),
                # exact torchvision topology so pretrained checkpoints
                # transplant (reference iwildcam/models.py:171)
                torchvision=config.get("torchvision_arch", False),
                # reference MCD on these tasks: rescaled per-example eval
                # dropout (iwildcam/models.py:75 freeze_on_eval=False)
                dropout_freeze_eval=False,
                dtype=dtype or jnp.float32,
                remat=config.get("conv_remat", "none"),
            )
        )
    if task == "poverty":

        class PovertyNet(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = True, component=None):
                h = ResNet18(
                    classes=1,
                    norm="batch_static",
                    conv_kind=kind,
                    components=components,
                    dropout_p=dropout_p,
                    dtype=dtype or jnp.float32,
                )(x, train=train, component=component)
                # reference poverty config keys init_std/learn_var
                # (poverty/models.py:47 GaussLayer(init_std, learn_var))
                return GaussLayer(
                    std_init=config.get("init_std", 0.1),
                    learn_var=config.get("learn_var", True),
                )(h, train=train)

        return Model(PovertyNet())
    if task in ("civilcomments", "amazon"):
        head = {"plain": "map", "bbb": "bbb", "rank1": "rank1"}.get(head_kind or kind, "map")
        if dropout_p is not None:
            head = "drop"
        return Model(
            BertClassifier(
                classes=spec.classes,
                head_kind=head,
                drop_p=dropout_p or 0.2,
                components=components,
                config=_bert_config(config),
                # reference build_mcd patches EVERY dropout (encoder
                # included) to sample at eval unless last_layer_mcd
                # (amazon/models.py:67-73)
                mc_encoder_dropout=(
                    head == "drop" and not config.get("last_layer_mcd", False)
                ),
                dtype=dtype,
            )
        )
    raise ValueError(f"unknown task {task!r}")


def _loss_fn_for(model: Model, regression: bool):
    def loss_fn(params, model_state, key, batch, component=None):
        x, y = batch
        kwargs = {} if component is None else {"component": component}
        out, kl, new_state = model.apply(params, model_state, key, x, train=True, **kwargs)
        if regression:
            loss = nll_loss(out, y)
            metrics = {}
        else:
            logp = jax.nn.log_softmax(out, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
            metrics = {"acc": jnp.mean(jnp.argmax(out, -1) == y)}
        return LossOutput(loss=loss, kl=kl, model_state=new_state, metrics=metrics)

    return loss_fn


def _predict_fn(model: Model, regression: bool):
    def apply_fn(params, model_state, key, x, n_samples=None, component=None):
        kwargs = {} if n_samples is None else {"n_samples": n_samples}
        if component is not None:
            # rank-1 mixtures: one JOINT component per posterior sample
            # (see methods/ensemble.py predict components doc)
            kwargs["component"] = component
        out, _, _ = model.apply(params, model_state, key, x, train=False, **kwargs)
        if regression:
            return out
        return jax.nn.log_softmax(out, axis=-1)

    return apply_fn


@dataclasses.dataclass
class BuiltExperiment:
    model: Model
    method: PosteriorMethod
    state: object
    apply_fn: Callable
    regression: bool


def _scheduled_lr(config, lr):
    """Per-task LR schedule over a base rate. The reference applies the
    SAME schedule to every optimizer of a composition — fmow.py:154-158
    builds ExponentialLR(gamma=lr_decay) for BOTH the last-layer head's
    base optimizer and the deterministic backbone optimizer — so this is
    shared by _tx (backbone/full-model) and the iVON head lr."""
    from ..utils.schedules import cosine_with_warmup

    schedule = config.get("lr_schedule_kind", "none")
    if schedule == "exponential":
        # staircase: torch ExponentialLR steps ONCE per epoch
        # (iwildcam.py scheduler.step() in the epoch loop), not smoothly
        return optax.exponential_decay(
            lr,
            transition_steps=config.get("steps_per_epoch", 1000),
            decay_rate=config.get("lr_decay_rate", 0.96),
            staircase=True,
        )
    if schedule == "cosine_warmup":
        total = config.get("steps_per_epoch", 1000) * config["epochs"]
        return cosine_with_warmup(lr, config.get("warmup_steps", total // 20), total)
    return lr


def _tx(config):
    """Base optimizer with the per-task LR schedules the reference wires:
    iWildCam ExponentialLR (iwildcam.py), RxRx1 cosine-with-warmup stepped
    per batch (rxrx1.py:128-170)."""
    lr = _scheduled_lr(config, config["lr"])

    # Only camelyon (and the CIFAR track) train with SGD+momentum in the
    # reference; iwildcam/fmow/rxrx1/poverty and the DistilBERT tasks all
    # use torch.optim.Adam (iwildcam/models.py:62, fmow/models.py:60,
    # rxrx1/models.py:57, poverty/models.py:50, amazon/models.py:55) —
    # their configs set optimizer_kind: adam. torch's Adam applies
    # weight_decay as L2 added to the gradient BEFORE the moment updates —
    # optax.add_decayed_weights before adam matches.
    kind = config.get("optimizer_kind", "sgd")
    inner = (
        optax.adam(lr)
        if kind == "adam"
        else optax.sgd(lr, momentum=config.get("momentum", 0.9))
    )
    base = optax.chain(
        optax.add_decayed_weights(config.get("weight_decay", 0.0)),
        inner,
    )
    if config.get("train_all_layers", True):
        return base

    # Freeze the pretrained encoder; train heads only (reference
    # ``train_all_layers`` flag, civilcomments/models.py:165-176).
    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen"
            if any(getattr(p, "key", "") == "bert" for p in path)
            else "train",
            params,
        )

    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, labels
    )


def _pretrained_path(task: str, config: dict):
    """Locate pretrained backbone weights (reference: torchvision resnet50
    for iwildcam/rxrx1, densenet121 for fmow, HF distilbert for the text
    tasks — iwildcam/models.py:171, fmow/models.py:135, bert.py:14).

    config['pretrained_path'] wins; otherwise 'auto' looks under
    $BDE_DATA_DIR/pretrained/{resnet50,densenet121}.pth and
    $BDE_DATA_DIR/distilbert-base-uncased/. config['pretrained']=False
    disables (random init, as all tests/hermetic runs use)."""
    explicit = config.get("pretrained_path")
    if explicit:
        return explicit
    if not config.get("pretrained", True):
        return None
    from ..data.uci import data_dir

    fname = {"iwildcam": "resnet50.pth", "rxrx1": "resnet50.pth",
             "fmow": "densenet121.pth", "camelyon17": None}.get(task)
    if fname:
        cand = os.path.join(data_dir(), "pretrained", fname)
        if os.path.exists(cand):
            return cand
    if wilds_data.TASKS[task].text:
        d = os.path.join(data_dir(), "distilbert-base-uncased")
        if os.path.exists(os.path.join(d, "pytorch_model.bin")):
            return d
    return None


def _load_pretrained(task: str, params, path: str):
    if wilds_data.TASKS[task].text:
        from ..models.bert import load_hf_weights

        return load_hf_weights(params, path)
    from ..models.torch_convert import load_torch_backbone

    return load_torch_backbone(path, params)


def build(task: str, config: dict, key: jax.Array, steps_per_epoch: int) -> BuiltExperiment:
    config = dict(config)
    pre_path = _pretrained_path(task, config)
    if pre_path and task in ("iwildcam", "rxrx1"):
        config.setdefault("torchvision_arch", True)
    name = config["model"]
    spec = wilds_data.TASKS[task]
    regression = spec.classes == 1
    members = config.get("members", 1)
    n = config["dataset_size"]
    k_model, k_method = jax.random.split(key)

    if spec.text:
        example = jnp.zeros((2,) + spec.input_shape, jnp.int32)
    else:
        shape = spec.input_shape
        if config.get("tiny"):
            shape = (32, 32, shape[-1])
        example = jnp.zeros((2,) + shape, jnp.float32)

    prior = GaussianPrior(0.0, config["prior_std"])

    def swag_interval():
        swag_epochs = max(1, config["epochs"] - config["swag_start_epoch"])
        return max(1, steps_per_epoch * swag_epochs // config["swag_updates"])

    def inner_factory_for(inner_name):
        """Builder taking a loss_fn -> PosteriorMethod (used both full-
        model and last-layer)."""
        if inner_name == "swag":
            return lambda lf: swag_method(
                lf,
                _tx(config),
                update_interval=swag_interval(),
                start_epoch=config["swag_start_epoch"],
                deviation_samples=config["swag_deviation_samples"],
                **_ring_kwargs(config),
            )
        if inner_name == "bbb":
            return lambda lf: bbb_method(
                lf,
                _tx(config),
                prior,
                dataset_size=n,
                mc_samples=config["bbb_mc_samples"],
                kl_rescaling=config["kl_rescaling"],
            )
        if inner_name == "ivon":
            # the schedule reaches iVON through its lr callable (the
            # reference's dual-scheduler decays the head optimizer too,
            # fmow.py:154-158)
            return lambda lf: ivon_method(
                lf,
                lr=_scheduled_lr(config, config["ivon_lr"]),
                prior_prec=config["ivon_prior_prec"],
                dataset_size=n,
                mc_samples=config["ivon_mc_samples"],
                # reference yaml ivon blocks carry damping (amazon.yaml:153)
                damping=config.get("ivon_damping", 0.0),
            )
        if inner_name == "svgd":
            return lambda lf: svgd_method(
                lf,
                _tx(config),
                particle_count=config["svgd_particles"],
                dataset_size=n,
                l2_reg=config["svgd_reg_scale"],
            )
        raise ValueError(inner_name)

    particles = None
    if name in ("map", "laplace"):
        model = _make_backbone(task, config, "plain")
        inner = map_method(_loss_fn_for(model, regression), _tx(config))
    elif name == "mcd":
        model = _make_backbone(task, config, "plain", dropout_p=config["dropout_p"])
        inner = map_method(_loss_fn_for(model, regression), _tx(config))
    elif name in ("swag", "bbb", "ivon", "svgd"):
        if name == "bbb":
            # Variational scope follows the reference per task: the
            # from-scratch camelyon/poverty nets are fully variational
            # (camelyon/models.py:97-116, poverty/models.py:77-83); the
            # pretrained-backbone tasks put a BBBLinear head on a plain
            # net unless all_layers_bbb (iwildcam/models.py:101-105,
            # rxrx1/models.py:82-86, fmow/models.py:92-96); text heads
            # are resolved inside _make_backbone.
            head_only = task in ("iwildcam", "rxrx1", "fmow") and not config.get(
                "all_layers_bbb", False
            )
            model = _make_backbone(
                task, config, "plain" if head_only else "bbb", head_kind="bbb"
            )
        else:
            model = _make_backbone(task, config, "plain")
        inner = inner_factory_for(name)(_loss_fn_for(model, regression))
        if name == "svgd":
            particles = config["svgd_particles"]
    elif name == "rank1":
        # same per-task scope: head-only Rank1Linear on the pretrained
        # backbones (iwildcam/models.py:110-114, rxrx1/models.py:88-92,
        # fmow/models.py:98-102), fully rank-1 elsewhere
        rank1_head_only = task in ("iwildcam", "rxrx1", "fmow")
        model = _make_backbone(
            task, config, "plain" if rank1_head_only else "rank1", head_kind="rank1"
        )
        inner = bbb_method(
            _loss_fn_for(model, regression),
            _tx(config),
            prior,
            dataset_size=n,
            mc_samples=config["bbb_mc_samples"],
            components=config["rank1_components"],
            l2_scale=config["rank1_l2_scale"],
        )
    elif name in ("swag_ll", "ll_bbb", "ll_ivon", "ll_svgd"):
        # Last-layer variants (reference iwildcam/models.py:87-154):
        # deterministic backbone optimizer + Bayesian head.
        inner_name = name.replace("_ll", "").replace("ll_", "")
        head_kind = "bbb" if inner_name == "bbb" else "plain"
        model = _make_backbone(task, config, "plain", head_kind=head_kind)
        mask_kwargs = {}
        if spec.text:
            # BERT "last layer" = the whole 2-layer classifier head
            # (reference passes classifier.parameters() to the last-layer
            # optimizer, civilcomments/models.py).
            def bert_head_mask(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: not any(
                        getattr(p, "key", None) == "bert" for p in path
                    ),
                    params,
                )

            mask_kwargs["mask_fn"] = bert_head_mask
        inner = last_layer_method(
            _loss_fn_for(model, regression),
            inner_factory_for(inner_name),
            backbone_tx=_tx(config),
            head_particles=config["svgd_particles"] if inner_name == "svgd" else 0,
            **mask_kwargs,
        )
    elif name == "sngp":
        model = _make_sngp(task, config)
        inner = sngp_method(
            _loss_fn_for(model, regression),
            _tx(config),
            ridge_penalty=config["sngp"]["ridge_penalty"],
        )
    else:
        raise ValueError(f"unknown model {name!r}")

    apply_fn = _predict_fn(model, regression)

    def init_params(k):
        params, ms = model.init(k, example)
        if pre_path:
            # every member/particle starts from the pretrained backbone
            # (heads and variational std leaves stay at their random init,
            # matching the reference's make_module_bbb over a pretrained
            # net, bbb_layers.py:278-300)
            params = _load_pretrained(task, params, pre_path)
        return params, ms

    if particles is not None:
        keys = jax.random.split(k_model, particles)
        pairs = [init_params(k) for k in keys]
        stacked = tree_stack([p for p, _ in pairs])
        state = inner.init(k_method, stacked, pairs[0][1])
        return BuiltExperiment(model, inner, state, apply_fn, regression)
    if members > 1:
        method = deep_ensemble(inner, members)
        keys = jax.random.split(k_model, members)
        pairs = [init_params(k) for k in keys]
        stacked = tree_stack([p for p, _ in pairs])
        ms = (
            jax.tree.map(lambda *ls: jnp.stack(ls), *[s for _, s in pairs])
            if pairs[0][1]
            else {}
        )
        state = method.init(k_method, stacked, ms)
        return BuiltExperiment(model, method, state, apply_fn, regression)
    params, ms = init_params(k_model)
    state = inner.init(k_method, params, ms)
    return BuiltExperiment(model, inner, state, apply_fn, regression)


def _make_sngp(task: str, config: dict) -> Model:
    """Spectral-norm backbone + SNGP head for image tasks; BERT + SNGP
    head for text (reference iwildcam/fmow/civilcomments sngp builders)."""
    spec = wilds_data.TASKS[task]
    sngp_kwargs = config["sngp"]

    if spec.text:

        class BertSNGP(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = True, n_samples: int = 1):
                from ..models.bert import DistilBertEncoder

                cfg = _bert_config(config)
                hidden = DistilBertEncoder(cfg, name="bert")(
                    x[:, :, 0], x[:, :, 1], train=train
                )
                return SNGPHead(outputs=spec.classes, **sngp_kwargs)(
                    hidden[:, 0], train=train, n_samples=n_samples
                )

        return Model(BertSNGP())

    class ImageSNGP(nn.Module):
        """Spectral-normalized featurizer (penultimate pooled features)
        + SNGP head — the reference cuts the backbone head and wraps the
        trunk with spectral norm (cifar/models.py:85-99, same pattern on
        the WILDS tasks)."""

        @nn.compact
        def __call__(self, x, train: bool = True, n_samples: int = 1):
            tiny = config.get("tiny", False)
            if task in ("camelyon17", "fmow"):
                from ..models.densenet import DenseNet

                feats = DenseNet(
                    growth_rate=4 if tiny else 32,
                    block_config=(2, 2) if tiny else (6, 12, 24, 16),
                    init_features=8 if tiny else 64,
                    bn_size=2 if tiny else 4,
                    conv_kind="spectral",
                    track_running_stats=not config.get("static_bn", True),
                )(x, train=train)
            elif task == "poverty":
                feats = ResNet18(
                    classes=1, conv_kind="spectral", features_only=True
                )(x, train=train)
            else:
                feats = ResNet50(
                    classes=spec.classes,
                    conv_kind="spectral",
                    features_only=True,
                    stage_sizes=(1, 1) if tiny else (3, 4, 6, 3),
                )(x, train=train)
            return SNGPHead(outputs=spec.classes, **sngp_kwargs)(
                feats, train=train, n_samples=n_samples
            )

    return Model(ImageSNGP())


def _n_members_of(config: dict) -> int:
    """Leading member/particle axis of the built state (1 = none)."""
    if config.get("model") == "svgd":
        return config.get("svgd_particles", 1)
    return config.get("members", 1)


def _ring_kwargs(config: dict) -> dict:
    """Posterior-ring scaling knobs (methods/rings.py) from config.

    ``ring_dtype: bf16`` stores the SWAG deviation ring in bfloat16
    (halves its HBM: a 30-slot fp32 ring over ResNet-50's 25.6M params
    is ~3 GB). ``ring_shard: true`` shards the ring's flat parameter
    dimension over the mesh's data axis, so each of N devices holds
    [K, D/N] — requires >1 device; composes with ``data_parallel``.
    YAML examples: configs/iwildcam.yaml, configs/fmow.yaml swag blocks.
    """
    kw = {}
    rd = config.get("ring_dtype")
    if rd in ("bf16", "bfloat16"):
        kw["ring_dtype"] = jnp.bfloat16
    elif rd not in (None, "fp32", "float32"):
        raise ValueError(f"ring_dtype {rd!r} (want fp32 or bf16)")
    if config.get("ring_shard") and jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_mesh

        n_members = _n_members_of(config)
        mp = (
            n_members
            if n_members > 1 and jax.device_count() % n_members == 0
            else 1
        )
        mesh = make_mesh(member_parallel=mp)
        kw["ring_sharding"] = NamedSharding(mesh, P(None, "data"))
    return kw


def train(built: BuiltExperiment, config: dict, x, y, log=None, epoch_callback=None):
    """epoch_callback(epoch, built) runs after finalize_epoch — the
    reference's eval_while_train periodic validation hook
    (camelyon.py:138-146); combine with utils.early_stopping.

    Multi-chip: ``data_parallel: true`` places the state on a
    (member, data) mesh via ParallelTrainer — batches shard over the
    data axis (XLA all-reduces gradients over ICI), ensemble members /
    SVGD particles shard over the member axis. This replaces the
    reference's pmap+psum data parallelism (the JAX subtree's only
    multi-device path, bnn_hmc/utils/train_utils.py:119-164) on the
    WILDS engine; single-device runs take the plain path.

    ``device_data: true`` uploads the (subsampled) train set to HBM once
    and folds each epoch into ONE jitted scan (make_epoch_runner) — the
    per-minibatch host dispatch (~30 ms RTT on the tunneled backend)
    disappears. Use when the task data fits HBM (the text tasks: amazon
    245k x 512 x 2 int32 ~= 1 GB; any subsampled run); image tasks at
    full scale keep the prefetching host loop with scan_steps chunking.

    The two COMPOSE: with both flags the dataset is sharded over the
    mesh's data axis (each device holds n_data/D examples), the state
    lives member-sharded/replicated on the mesh, and the whole epoch is
    ONE jitted scan whose per-step batches stay data-sharded — XLA
    inserts the gradient all-reduces over ICI inside the scan, and batch
    statistics (StaticBatchNorm) reduce globally, so the math is
    bit-identical to the single-device epoch. This is the TPU replacement
    for the reference's only multi-device mode, the fused pmap+scan epoch
    (google-bnn-hmc/bnn_hmc/utils/train_utils.py:218-267 pmapped
    lax.scan over device-sharded epoch batches): one host dispatch per
    epoch AND data parallelism at once. Equivalence vs the single-device
    epoch runner: tests/test_engine_parallel.py
    test_mesh_epoch_runner_matches_single_device."""
    method, state = built.method, built.state
    trainer = None
    if config.get("data_parallel") and jax.device_count() > 1:
        from ..parallel.pipelines import ParallelTrainer

        n_members = _n_members_of(config)
        mp = (
            n_members
            if n_members > 1 and jax.device_count() % n_members == 0
            else 1
        )
        trainer = ParallelTrainer(method, n_members=n_members, member_parallel=mp)
        state = trainer.place_state(state)
    update = jax.jit(method.update)

    key = jax.random.key(config["seed"])
    ckpt_dir = config.get("checkpoint_dir")

    if config.get("device_data"):
        import contextlib

        from ..parallel.multistep import make_epoch_runner

        data_dev = (jnp.asarray(x), jnp.asarray(y))
        mesh_ctx = contextlib.nullcontext
        if trainer is not None:
            # Fused DP x device-resident epoch: shard the staged dataset
            # over the data axis (batch_size must divide by the data-axis
            # extent so each scanned minibatch stays sharded; otherwise
            # fall back to replicated data — still correct, no DP win).
            data_size = trainer.mesh.shape["data"]
            if (
                x.shape[0] % data_size == 0
                and config["batch_size"] % data_size == 0
            ):
                data_dev = trainer.place_batch(data_dev)
            else:
                from ..parallel.mesh import replicate

                data_dev = replicate(trainer.mesh, data_dev)
            mesh_ctx = lambda: jax.set_mesh(trainer.mesh)  # noqa: E731
        epoch_runner = make_epoch_runner(
            method.update, x.shape[0], config["batch_size"]
        )
        start_epoch = 0
        if ckpt_dir:
            from ..utils import checkpoint as _ckpt

            state, resumed = _ckpt.restore_checkpoint(ckpt_dir, state)
            if resumed is not None:
                start_epoch = resumed + 1
        for epoch in range(start_epoch, config["epochs"]):
            with mesh_ctx():
                state, metrics = epoch_runner(
                    state, jax.random.fold_in(key, epoch), data_dev
                )
            epoch_loss = float(metrics["loss"])
            if not np.isfinite(epoch_loss):
                raise RuntimeError("Diverged")  # reference civil.py:156-160
            if trainer is not None:
                state = trainer.finalize_epoch(state)
            else:
                state = method.finalize_epoch(state)
            built.state = state
            if ckpt_dir and (epoch + 1) % config.get("checkpoint_interval", 20) == 0:
                from ..utils import checkpoint as _ckpt

                # async on the accelerator path: the orbax write (and the
                # device->host transfer behind it) overlaps the next
                # epoch's device-resident scan — measured x29->x1.n epoch
                # overhead for DistilBERT (benchmarks/sustained_big.py)
                _ckpt.save_checkpoint(
                    ckpt_dir, epoch, state,
                    async_save=config.get(
                        "async_checkpoint", jax.default_backend() != "cpu"
                    ),
                )
            if log:
                log(f"epoch {epoch}: loss {epoch_loss:.4f}")
            if epoch_callback is not None:
                epoch_callback(epoch, built)
        built.state = state
        if ckpt_dir:
            from ..utils import checkpoint as _ckpt

            _ckpt.wait_for_async_saves()
        return built

    scan_steps = config.get("scan_steps", 1)
    if scan_steps > 1 and trainer is None:
        from ..parallel.multistep import make_multi_step, stack_batches

        multi = make_multi_step(method.update, scan_steps)
    loader = PrefetchLoader((x, y), config["batch_size"], seed=config["seed"])
    # Periodic checkpoints + preemption-safe auto-resume (reference saves
    # every 20 epochs, camelyon.py:134; resume via use_checkpoint config).
    start_epoch = 0
    if ckpt_dir:
        from ..utils import checkpoint as _ckpt

        state, resumed = _ckpt.restore_checkpoint(ckpt_dir, state)
        if resumed is not None:
            start_epoch = resumed + 1
            if log:
                log(f"resumed from epoch {resumed}")
    step = start_epoch * len(loader)
    for epoch in range(start_epoch, config["epochs"]):
        losses = []
        pending = []
        for xb, yb in loader.epoch(epoch):
            step += 1
            batch = (jnp.asarray(xb), jnp.asarray(yb))
            if scan_steps > 1 and trainer is None:
                pending.append(batch)
                if len(pending) == scan_steps:
                    state, metrics = multi(
                        state, jax.random.fold_in(key, step), stack_batches(pending)
                    )
                    pending = []
                    losses.append(metrics["loss"])
                continue
            if trainer is not None:
                state, metrics = trainer.step(state, jax.random.fold_in(key, step), batch)
            else:
                state, metrics = update(state, jax.random.fold_in(key, step), batch)
            losses.append(metrics["loss"])
        for batch in pending:  # leftover < scan_steps
            step += 1
            state, metrics = update(state, jax.random.fold_in(key, step), batch)
            losses.append(metrics["loss"])
        epoch_loss = float(jnp.mean(jnp.stack(losses)))
        if not np.isfinite(epoch_loss):
            raise RuntimeError("Diverged")  # reference civil.py:156-160
        if trainer is not None:
            state = trainer.finalize_epoch(state)
        else:
            state = method.finalize_epoch(state)
        built.state = state
        if ckpt_dir and (epoch + 1) % config.get("checkpoint_interval", 20) == 0:
            # same overlap as the device-resident path: on accelerator
            # backends the save must not block the epoch loop on the
            # device->host transfer (sustained_big measured x29)
            _ckpt.save_checkpoint(
                ckpt_dir, epoch, state,
                async_save=config.get(
                    "async_checkpoint", jax.default_backend() != "cpu"
                ),
            )
        if log:
            log(f"epoch {epoch}: loss {epoch_loss:.4f}")
        if epoch_callback is not None:
            epoch_callback(epoch, built)
    built.state = state
    if ckpt_dir:
        _ckpt.wait_for_async_saves()
    return built


@functools.lru_cache(maxsize=8)
def _metrics_program(bin_count: int):
    """Jit-compose bayesian_model_average -> analyze_output ->
    EvalResult.create into ONE dispatch (keyed on the static bin count;
    jit re-specializes per outputs/targets shape)."""

    @jax.jit
    def prog(outputs, targets):
        lm = bayesian_model_average(outputs)
        correct, conf, ll, _, _ = analyze_output(lm, targets)
        return lm, EvalResult.create(correct, conf, ll, bin_count=bin_count)

    return prog


def eval_task(built: BuiltExperiment, task: str, config: dict, x, y, meta, seed=42,
              timings: dict = None):
    """Posterior-predictive eval + the task's official WILDS metrics.

    On accelerator backends the whole test set is staged in HBM and the
    posterior-predictive sweep runs as ONE jitted scan
    (parallel/multistep.py make_eval_runner) — one dispatch instead of
    one ~30 ms tunnel round trip per batch. The host loop below is the
    semantics-defining fallback (same fold_in(key, batch) streams, same
    edge-replication padding), used on CPU and for test sets too large
    to stage (> ~2 GB)."""
    spec = wilds_data.TASKS[task]
    bs = config["eval_batch_size"]
    key = jax.random.key(seed)
    # rank-1 mixtures: posterior sample i evaluates joint component
    # i % components (reference rank1.py per-layer counters in lockstep)
    components = (
        config.get("rank1_components", 1) if config.get("model") == "rank1" else 1
    )

    device_eval = config.get(
        "device_eval",
        (bool(config.get("device_data")) or jax.default_backend() != "cpu")
        and x.nbytes <= 2 << 30,
    )
    if device_eval:
        import contextlib

        from ..parallel.multistep import make_eval_runner

        # data_parallel composes with the device-resident eval exactly as
        # with the device-resident epoch (train() above): the staged test
        # set shards over the data axis, the posterior-predictive scan
        # compiles SPMD on the (member, data) mesh and XLA inserts any
        # cross-device collectives. Metrics parity vs the host loop:
        # tests/test_engine_parallel.py test_mesh_eval_matches_host_eval.
        mesh = None
        if config.get("data_parallel") and jax.device_count() > 1:
            from ..parallel.mesh import make_mesh

            n_members = _n_members_of(config)
            mp = (
                n_members
                if n_members > 1 and jax.device_count() % n_members == 0
                else 1
            )
            mesh = make_mesh(member_parallel=mp)

        def predict_one(state, k, xb):
            samples = predict(
                built.method, state, built.apply_fn, xb,
                n_samples=config["eval_samples"], key=k, components=components,
            )  # [S, bs, ...]
            return jnp.swapaxes(samples, 0, 1)  # runner wants batch leading

        # cache the jitted whole-test-set runner per shape (eval_while_train
        # calls this every epoch with identical shapes; a fresh closure
        # would recompile the big scan each time)
        cache = getattr(built, "_eval_runners", None)
        if cache is None:
            cache = {}
            built._eval_runners = cache
        cache_key = (x.shape, bs, config["eval_samples"])
        if cache_key not in cache:
            cache[cache_key] = make_eval_runner(predict_one, x.shape[0], bs)
        # cache the STAGED (and mesh-sharded) test set too: the val split
        # is constant across eval_while_train epochs, and re-staging it
        # per call is a full host->device transfer — 308 MB for fmow's
        # 512x224px val set, measured ~15 s/epoch through the tunnel
        # (benchmarks/sustained_big.py instrumented run, r5). Keyed by
        # array identity: a caller passing a DIFFERENT array restages.
        scache = getattr(built, "_eval_staged", None)
        if scache is None:
            scache = {}
            built._eval_staged = scache
        mesh_ctx = contextlib.nullcontext
        if mesh is not None:
            mesh_ctx = lambda: jax.set_mesh(mesh)  # noqa: E731
        ent = scache.get(x.shape)
        if ent is not None and ent[0] is x:
            xdev = ent[1]
        else:
            xdev = jnp.asarray(x)
            if mesh is not None:
                from ..parallel.mesh import replicate, shard_batch

                data_size = mesh.shape["data"]
                if x.shape[0] % data_size == 0 and bs % data_size == 0:
                    xdev = shard_batch(mesh, xdev)
                else:
                    xdev = replicate(mesh, xdev)
            scache[x.shape] = (x, xdev)
        import time as _time

        _t0 = _time.perf_counter()
        with mesh_ctx():
            out = cache[cache_key](built.state, key, xdev)  # [N, S, ...]
        _t1 = _time.perf_counter()
        outputs = np.moveaxis(np.asarray(out), 1, 0)  # [S, N, ...]
        _t2 = _time.perf_counter()
        if timings is not None:
            timings["dispatch_s"] = _t1 - _t0
            timings["fetch_s"] = _t2 - _t1
        targets = np.asarray(y)
    else:
        @jax.jit
        def predict_batch(state, xb, key):
            return predict(
                built.method, state, built.apply_fn, xb,
                n_samples=config["eval_samples"], key=key, components=components,
            )

        outs, targets = [], []
        # Pad the final partial batch, trim after: every point evaluated once.
        for i, start in enumerate(range(0, x.shape[0], bs)):
            xb = x[start : start + bs]
            valid = xb.shape[0]
            if valid < bs:
                xb = np.concatenate([xb, np.repeat(xb[-1:], bs - valid, axis=0)])
            samples = predict_batch(built.state, jnp.asarray(xb), jax.random.fold_in(key, i))
            outs.append(np.asarray(samples)[:, :valid])
            targets.append(y[start : start + valid])
        outputs = np.concatenate(outs, axis=1)  # [S, N, ...]
        targets = np.concatenate(targets)
    meta = meta[: targets.shape[0]]

    if built.regression:
        res = RegressionResults.create(
            jnp.asarray(outputs), jnp.asarray(targets), key=jax.random.key(seed + 1)
        )
        preds = outputs[..., 0].mean(axis=0)
        official = wilds_data.evaluate_task(task, preds, np.asarray(targets), meta)
        return {
            "avg_lml": float(res.average_lml),
            "avg_ll": float(res.average_log_likelihood),
            "mse": float(res.mse_of_means),
            "qce": float(res.qce),
            "sqce": float(res.sqce),
            **official,
        }

    # ONE jitted metrics program + one bulk fetch: the BMA/analysis/ECE
    # chain is ~40 eager jnp ops, each a tunnel round trip on the
    # accelerator backend — and they queue behind the overlapped
    # checkpoint thread's device_get (measured 26-33 s/epoch of the
    # sustained DistilBERT eval before this, benchmarks/sustained_big.py)
    lm_dev, result = _metrics_program(config["ece_bins"])(
        jnp.asarray(outputs), jnp.asarray(targets)
    )
    log_marginal = np.asarray(lm_dev)
    result = jax.device_get(result)
    preds = log_marginal.argmax(axis=1)
    official = wilds_data.evaluate_task(task, preds, np.asarray(targets), meta)
    return {**result.as_dict(), **official}


def run_single(task: str, config: dict, log=None) -> dict:
    config = {**DEFAULT_CONFIG, **config}
    x, y, xt, yt, mt = _load_task_data(task, config)
    steps_per_epoch = config["steps_per_epoch"]

    built = build(task, config, jax.random.key(config["seed"]), steps_per_epoch)

    epoch_callback = None
    if config.get("eval_while_train"):
        xv, yv, mv = wilds_data.load_wilds(task, "val", subsample=config["test_subsample"], fold=config.get("fold"))
        if config.get("tiny") and not wilds_data.TASKS[task].text:
            xv = xv[:, :32, :32, :]
        interval = config.get("eval_interval", 1)

        def epoch_callback(epoch, b):
            if epoch % interval == 0:
                val = eval_task(b, task, config, xv, yv, mv)
                if log:
                    log(f"  val@{epoch}: " + ", ".join(
                        f"{k}={v:.4f}" for k, v in val.items() if isinstance(v, float)
                    ))

    built = train(built, config, x, y, log=log, epoch_callback=epoch_callback)

    if config.get("checkpoint_dir"):
        # The {model}_final artifact the downstream phases read
        # (reference cifar.py:98, consumed by eval_ensembles/fit_laplace).
        from ..utils import checkpoint as _ckpt

        _ckpt.save_final(config["checkpoint_dir"], config["model"], built.state)

    if config["model"] == "laplace":
        lap = laplace_method(
            built.model,
            hessian=config["ll_hessian"],
            regression=built.regression,
            inner=built.method,
        )
        built.state = lap.fit(built.state, (jnp.asarray(x), jnp.asarray(y)))
        built.method = lap

    return eval_task(built, task, config, xt, yt, mt)


def _load_task_data(task: str, config: dict):
    x, y, _ = wilds_data.load_wilds(task, "train", subsample=config["subsample"], fold=config.get("fold"))
    xt, yt, mt = wilds_data.load_wilds(task, "test", subsample=config["test_subsample"], fold=config.get("fold"))
    if config.get("tiny") and not wilds_data.TASKS[task].text:
        x, xt = x[:, :32, :32, :], xt[:, :32, :32, :]
    config["dataset_size"] = x.shape[0]
    config["steps_per_epoch"] = max(1, x.shape[0] // config["batch_size"])
    return x, y, xt, yt, mt


def fit_laplace_phase(task: str, config: dict, run_dir: str, log=None) -> dict:
    """Post-hoc Laplace on a saved final checkpoint — the reference's
    per-task ``fit_laplace.py`` scripts (e.g. civilcomments/fit_laplace.py,
    iwildcam/fit_laplace.py): load ``{model}_final`` from a finished MAP
    run, fit the GGN Laplace on train data, evaluate on test."""
    from ..utils import checkpoint as _ckpt

    config = {**DEFAULT_CONFIG, **config}
    config["model"] = config.get("from_model", "map")
    x, y, xt, yt, mt = _load_task_data(task, config)
    built = build(task, config, jax.random.key(config["seed"]), config["steps_per_epoch"])
    built.state = _ckpt.restore_final(run_dir, config["model"], built.state)
    lap = laplace_method(
        built.model,
        hessian=config["ll_hessian"],
        regression=built.regression,
        inner=built.method,
    )
    built.state = lap.fit(built.state, (jnp.asarray(x), jnp.asarray(y)))
    built.method = lap
    if log:
        log(f"fit_laplace: prior_prec={float(built.state.prior_prec):.4g}")
    return eval_task(built, task, config, xt, yt, mt)


def eval_only_phase(task: str, config: dict, run_dir: str, log=None) -> dict:
    """Re-evaluate a saved ``{model}_final`` checkpoint without training
    (reference camelyon/eval_only.py and the amazon/civil ``eval_only``
    config flag, amazon.py:86)."""
    from ..utils import checkpoint as _ckpt

    config = {**DEFAULT_CONFIG, **config}
    _, _, xt, yt, mt = _load_task_data(task, config)
    built = build(task, config, jax.random.key(config["seed"]), config["steps_per_epoch"])
    built.state = _ckpt.restore_final(run_dir, config["model"], built.state)
    if log:
        log(f"eval_only: restored {config['model']}_final from {run_dir}")
    return eval_task(built, task, config, xt, yt, mt)


def sweep_drop_rates_phase(
    task: str, config: dict, run_dir: str, rates=(0.05, 0.1, 0.2, 0.3, 0.5), log=None
) -> dict:
    """Evaluate a saved MC-Dropout checkpoint under different dropout
    rates (reference civilcomments/test_drop_rates.py:33-51: patch_dropout
    with patch_fixable over a saved MCD state). Dropout has no parameters,
    so the checkpoint transplants into a rebuilt model at each rate."""
    from ..utils import checkpoint as _ckpt

    config = {**DEFAULT_CONFIG, **config, "model": "mcd"}
    _, _, xt, yt, mt = _load_task_data(task, config)
    built = build(task, config, jax.random.key(config["seed"]), config["steps_per_epoch"])
    built.state = _ckpt.restore_final(run_dir, "mcd", built.state)
    results = {}
    for rate in rates:
        rebuilt = build(
            task,
            {**config, "dropout_p": float(rate)},
            jax.random.key(config["seed"]),
            config["steps_per_epoch"],
        )
        rebuilt.state = built.state  # same params; only the drop rate differs
        res = eval_task(rebuilt, task, config, xt, yt, mt)
        results[f"p={rate}"] = res
        if log:
            log(f"drop rate {rate}: acc={res.get('accuracy', float('nan')):.4f} "
                f"ece={res.get('ece', float('nan')):.4f}")
    return results


def multix_phase(
    task: str, config: dict, run_dirs, leave_out: int = None, log=None
) -> dict:
    """MultiX: stack independently trained ``{model}_final`` checkpoints
    into a deep ensemble and evaluate (reference per-task
    ``eval_ensembles.py``, leave-one-out over 5 reps,
    civilcomments/eval_ensembles.py:34-48)."""
    from . import phases
    from ..utils import checkpoint as _ckpt

    config = {**DEFAULT_CONFIG, **config}
    _, _, xt, yt, mt = _load_task_data(task, config)
    built = build(task, config, jax.random.key(config["seed"]), config["steps_per_epoch"])
    states = [_ckpt.restore_final(d, config["model"], built.state) for d in run_dirs]
    built.method, built.state = phases.multix_from_checkpoints(
        built.method, states, leave_out=leave_out
    )
    if log:
        log(f"multix: {len(run_dirs)} members, leave_out={leave_out}")
    return eval_task(built, task, config, xt, yt, mt)
