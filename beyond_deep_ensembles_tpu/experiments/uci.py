"""UCI regression experiment (the minimum end-to-end slice).

Reference experiments/uci/{uci.py,models.py}: 1x50 MLP + GaussLayer, all
algorithms, NLL loss with variance clamp, RegressionResults over
``eval_samples`` posterior draws, plain + gap splits, grid-search HPO.

TPU-native training loop: ONE jitted update per minibatch; ensemble
members are a vmapped axis inside that update (the reference trained
members sequentially, uci.py:85). Evaluation jits a single
(samples x testset) prediction program.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.uci import UCIDataset, batch_iter
from ..evals.regression import RegressionResults, nll_loss
from ..methods import (
    GaussianPrior,
    LossOutput,
    bbb_method,
    deep_ensemble,
    ivon_method,
    map_method,
    predict,
    svgd_method,
    swag_method,
)
from ..methods.api import PosteriorMethod
from ..methods.laplace import laplace_method
from ..models.mlp import RegressionMLP
from ..nn.base import Model
from ..tree import tree_stack

DEFAULT_CONFIG = {
    "dataset": "yacht",
    "batch_size": 32,
    "epochs": 40,
    "eval_samples": 100,
    "members": 1,
    "std_init": 1.0,
    "learn_var": False,
    "normalize": True,
    "val_percentage": 1.0,
    "dropout_p": 0.1,
    "prior_std": 1.0,
    "lr": 0.01,
    "weight_decay": 0.0,
    "var_lr": 0.01,
    "seed": 0,
    # algorithm-specific
    "mc_samples": 2,
    "kl_rescaling": 1.0,
    "components": 1,
    "l2_scale": 0.0,
    "swag_start": 0.75,
    "swag_deviation_samples": 30,
    "svgd_particles": 10,
    "svgd_l2": 1e-4,
    "ivon_lr": 0.01,
    "ivon_prior_prec": 100.0,
    "ivon_mc_samples": 5,
    "ll_hessian": "full",
    "laplace_samples": 100,
}


@dataclasses.dataclass
class BuiltExperiment:
    model: Model
    method: PosteriorMethod
    state: object
    apply_fn: Callable  # (params, model_state, key, x) -> [B, 1, 2]


def _make_model(config, dense_kind="plain", dropout_p=0.0) -> Model:
    return Model(
        RegressionMLP(
            hidden=50,
            out_dim=1,
            dense_kind=dense_kind,
            dropout_p=dropout_p,
            components=config.get("components", 1),
            std_init=config["std_init"],
            learn_var=config["learn_var"],
        )
    )


def _loss_fn_for(model: Model):
    def loss_fn(params, model_state, key, batch, component=None):
        x, y = batch
        kwargs = {} if component is None else {"component": component}
        out, kl, new_state = model.apply(params, model_state, key, x, train=True, **kwargs)
        return LossOutput(loss=nll_loss(out, y), kl=kl, model_state=new_state)

    return loss_fn


def _apply_fn_for(model: Model):
    def apply_fn(params, model_state, key, x, component=None):
        kwargs = {} if component is None else {"component": component}
        out, _, _ = model.apply(params, model_state, key, x, train=False, **kwargs)
        return out

    return apply_fn


def _base_tx(config):
    wd = config.get("weight_decay", 0.0)
    # The GaussLayer rho (``__mle``) is trained by a separate SGD in the
    # reference (uci/models.py:17-21); optax multi-transform reproduces it.
    # Weight decay: torch.optim.Adam's weight_decay is COUPLED L2 (added
    # to the gradient BEFORE the moment updates), not AdamW's decoupled
    # decay — add_decayed_weights before adam reproduces the reference
    # builders (uci/models.py:53 Adam(**config["optimizer"]["base"])).
    main = (
        optax.chain(optax.add_decayed_weights(wd), optax.adam(config["lr"]))
        if wd
        else optax.adam(config["lr"])
    )
    var = optax.sgd(config.get("var_lr", 0.01))

    def label(params):
        from ..methods.api import split_gaussian_labels

        labels = split_gaussian_labels(params)
        return jax.tree.map(lambda l: "mle" if l == "mle" else "main", labels)

    return optax.multi_transform({"main": main, "mle": var}, label)


def build(config: dict, train_set_size: int, key: jax.Array) -> BuiltExperiment:
    """Build (model, method, initial state) for config['model']
    (reference experiments/uci/models.py get_model)."""
    name = config["model"]
    members = config.get("members", 1)
    k_model, k_method = jax.random.split(key)
    example = jnp.zeros((1, config["in_dim"]), jnp.float32)

    def init_stack(model, n):
        keys = jax.random.split(k_model, n)
        params_list, states = zip(*[model.init(k, example) for k in keys])
        return tree_stack(list(params_list)), jax.tree.map(
            lambda *ls: jnp.stack(ls), *states
        ) if states[0] else {}

    if name in ("map", "laplace"):
        model = _make_model(config)
        inner = map_method(_loss_fn_for(model), _base_tx(config))
    elif name == "mcd":
        model = _make_model(config, dropout_p=config["dropout_p"])
        inner = map_method(_loss_fn_for(model), _base_tx(config))
    elif name == "swag":
        model = _make_model(config)
        steps_per_epoch = max(1, train_set_size // config["batch_size"])
        start_epoch = int(config["swag_start"] * config["epochs"])
        swag_epochs = max(1, config["epochs"] - start_epoch)
        # explicit interval wins (reference yaml sets update_interval
        # directly, uci.yaml SWAG block); else the HPO-formula derivation
        update_interval = config.get("swag_update_interval") or max(
            1, int(steps_per_epoch * swag_epochs / 30)
        )
        inner = swag_method(
            _loss_fn_for(model),
            _base_tx(config),
            update_interval=update_interval,
            start_epoch=start_epoch,
            deviation_samples=config["swag_deviation_samples"],
        )
    elif name in ("bbb", "bbb_fixed_kl"):
        model = _make_model(config, dense_kind="bbb")
        prior = GaussianPrior(0.0, config["prior_std"])
        inner = bbb_method(
            _loss_fn_for(model),
            _base_tx(config),
            prior,
            dataset_size=train_set_size,
            mc_samples=config["mc_samples"],
            kl_rescaling=config["kl_rescaling"] if name == "bbb" else 1.0,
        )
    elif name == "rank1":
        model = _make_model(config, dense_kind="rank1")
        prior = GaussianPrior(0.0, config["prior_std"])
        inner = bbb_method(
            _loss_fn_for(model),
            _base_tx(config),
            prior,
            dataset_size=train_set_size,
            mc_samples=config["mc_samples"],
            components=config.get("components", 1),
            l2_scale=config.get("l2_scale", 0.0),
        )
    elif name == "svgd":
        model = _make_model(config)
        inner = svgd_method(
            _loss_fn_for(model),
            _base_tx(config),
            particle_count=config["svgd_particles"],
            dataset_size=train_set_size,
            l2_reg=config["svgd_l2"],
        )
    elif name == "ivon":
        model = _make_model(config)
        inner = ivon_method(
            _loss_fn_for(model),
            lr=config["ivon_lr"],
            prior_prec=config["ivon_prior_prec"],
            dataset_size=train_set_size,
            mc_samples=config["ivon_mc_samples"],
        )
    else:
        raise ValueError(f"unknown model {name!r}")

    # Member/particle stacking.
    needs_stack_inner = name == "svgd"
    if needs_stack_inner:
        stacked, ms = init_stack(model, config["svgd_particles"])
        if members > 1:
            raise NotImplementedError("svgd ensembles use particles, not members")
        method = inner
        state = method.init(k_method, stacked, ms)
    elif members > 1:
        method = deep_ensemble(inner, members)
        stacked, ms = init_stack(model, members)
        state = method.init(k_method, stacked, ms)
    else:
        method = inner
        params, ms = model.init(k_model, example)
        state = method.init(k_method, params, ms)

    return BuiltExperiment(
        model=model, method=method, state=state, apply_fn=_apply_fn_for(model)
    )


def train(
    built: BuiltExperiment,
    config: dict,
    x: np.ndarray,
    y: np.ndarray,
    seed: int = 0,
    log: Optional[Callable[[str], None]] = None,
):
    """Epoch loop with one jitted update per minibatch
    (reference uci.py:82-125).

    Multi-chip: ``data_parallel: true`` shards batches over the data
    axis of a (member, data) mesh and ensemble members / SVGD particles
    over the member axis (parallel/pipelines.py ParallelTrainer) — the
    same story the CIFAR and WILDS engines wire, replacing the
    reference's pmap+psum (bnn_hmc/utils/train_utils.py:119-164)."""
    method, state = built.method, built.state
    trainer = None
    if config.get("data_parallel") and jax.device_count() > 1:
        from ..parallel.pipelines import ParallelTrainer

        n_members = (
            config.get("svgd_particles", 1)
            if config.get("model") == "svgd"
            else config.get("members", 1)
        )
        mp = (
            n_members
            if n_members > 1 and jax.device_count() % n_members == 0
            else 1
        )
        trainer = ParallelTrainer(method, n_members=n_members, member_parallel=mp)
        state = trainer.place_state(state)
    update = jax.jit(method.update)
    scan_steps = config.get("scan_steps", 1)
    if scan_steps > 1 and trainer is None:
        from ..parallel.multistep import make_multi_step, stack_batches

        multi = make_multi_step(method.update, scan_steps)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed)
    step = 0
    for epoch in range(config["epochs"]):
        epoch_loss, batches = 0.0, 0
        pending = []
        for xb, yb in batch_iter(x, y, config["batch_size"], rng):
            step += 1
            batch = (jnp.asarray(xb), jnp.asarray(yb))
            if scan_steps > 1 and trainer is None:
                pending.append(batch)
                if len(pending) == scan_steps:
                    state, metrics = multi(
                        state, jax.random.fold_in(key, step), stack_batches(pending)
                    )
                    pending = []
                    epoch_loss += float(metrics["loss"]) * scan_steps
                    batches += scan_steps
                continue
            if trainer is not None:
                state, metrics = trainer.step(state, jax.random.fold_in(key, step), batch)
            else:
                state, metrics = update(state, jax.random.fold_in(key, step), batch)
            epoch_loss += float(metrics["loss"])
            batches += 1
        for batch in pending:  # leftover < scan_steps
            step += 1
            state, metrics = update(state, jax.random.fold_in(key, step), batch)
            epoch_loss += float(metrics["loss"])
            batches += 1
        if trainer is not None:
            state = trainer.finalize_epoch(state)
        else:
            state = method.finalize_epoch(state)
        if log and epoch % 10 == 0:
            log(f"epoch {epoch}: train loss {epoch_loss / max(batches, 1):.5f}")
    built.state = state
    return built


def evaluate(
    built: BuiltExperiment,
    config: dict,
    x: np.ndarray,
    y: np.ndarray,
    dataset: UCIDataset,
    seed: int = 42,
) -> RegressionResults:
    """Posterior-predictive evaluation (reference uci.py:26-47): S draws
    over the full test set, then RegressionResults with denormalization."""
    outputs = predict(
        built.method,
        built.state,
        built.apply_fn,
        jnp.asarray(x),
        n_samples=config["eval_samples"],
        key=jax.random.key(seed),
        # rank-1 mixtures: sample i evaluates joint component i % C
        components=(
            config.get("components", 1) if config.get("model") == "rank1" else 1
        ),
    )
    return RegressionResults.create(
        outputs,
        jnp.asarray(y),
        key=jax.random.key(seed + 1),
        target_mean=float(np.asarray(dataset.y_mean).reshape(-1)[0]),
        target_std=float(np.asarray(dataset.y_std).reshape(-1)[0]),
    )


def run_single(config: dict, split: str = "train", gap: Optional[int] = None, log=None):
    """Train + eval one configuration; returns RegressionResults."""
    config = {**DEFAULT_CONFIG, **config}
    ds = UCIDataset(
        config["dataset"],
        normalize=config["normalize"],
        val_percentage=config["val_percentage"],
    )
    config["in_dim"] = ds.in_dim
    x_train, y_train = ds.get_arrays(
        "train" if split == "train" else "val_train", gap
    )
    x_test, y_test = ds.get_arrays("test" if split == "train" else "val_test", gap)

    built = build(config, train_set_size=x_train.shape[0], key=jax.random.key(config["seed"]))
    built = train(built, config, x_train, y_train, seed=config["seed"], log=log)

    if config["model"] == "laplace":
        built = fit_laplace(built, config, x_train, y_train)

    return evaluate(built, config, x_test, y_test, ds)


def fit_laplace(built: BuiltExperiment, config: dict, x: np.ndarray, y: np.ndarray):
    """Post-hoc last-layer Laplace on the trained MAP model
    (reference uci.py:127-136 via laplace-torch)."""
    method = laplace_method(
        built.model,
        hessian=config.get("ll_hessian", "full"),
        regression=True,
        inner=built.method,
    )
    built.state = method.fit(built.state, (jnp.asarray(x), jnp.asarray(y)))
    built.method = method
    return built


def grid_search(config: dict, ranges: dict, gap: Optional[int] = None, log=None) -> dict:
    """Reference tune_hyperparams (uci.py:151-166): full cross product on
    the validation split, select by average posterior log-likelihood."""
    best_ll, best = -float("inf"), None
    keys = list(ranges.keys())
    for combo in itertools.product(*[ranges[k] for k in keys]):
        trial = {**config, **dict(zip(keys, combo))}
        res = run_single(trial, split="val", gap=gap)
        ll = float(res.average_log_likelihood)
        if log:
            log(f"trial {dict(zip(keys, combo))}: ll {ll:.4f}")
        if ll > best_ll:
            best_ll, best = ll, dict(zip(keys, combo))
    return {**config, **(best or {})}


# Per-algorithm HPO grids (reference uci.py:168-291; knob names mapped to
# our flat config keys).
HPO_GRIDS = {
    "map": {"epochs": [40, 100], "lr": [0.01, 0.001], "weight_decay": [1e-4, 1e-5]},
    "laplace": {"epochs": [40, 100], "lr": [0.01, 0.001], "weight_decay": [1e-4, 1e-5]},
    "mcd": {
        "epochs": [40, 100],
        "lr": [0.01, 0.001],
        "weight_decay": [1e-4, 1e-5],
        "dropout_p": [0.2, 0.1, 0.05],
    },
    "swag": {
        "epochs": [60, 100, 150],
        "lr": [0.01, 0.001],
        "weight_decay": [1e-4, 1e-5],
        "swag_start": [0.5, 0.75, 0.9],
    },
    "bbb": {
        "epochs": [200],
        "lr": [0.01, 0.001],
        "prior_std": [0.1, 1.0, 10.0],
        "kl_rescaling": [0.2, 0.5],
    },
    "bbb_fixed_kl": {"epochs": [200], "lr": [0.01, 0.001], "prior_std": [0.1, 1.0, 10.0]},
    "rank1": {"epochs": [100, 200], "lr": [0.01, 0.001], "l2_scale": [1e-4, 1e-5]},
    "svgd": {"epochs": [40, 100], "lr": [0.01, 0.001], "svgd_l2": [1e-4, 1e-5]},
    "ivon": {
        "epochs": [40, 100, 200],
        "ivon_lr": [0.01],
        "ivon_prior_prec": [10.0, 100.0, 200.0],
    },
}


def run(config: dict, log=None) -> dict:
    """Top-level UCI flow (reference uci.py:49-80): optional HPO on the
    validation split, then the standard split over ``standard_split_reps``
    seeds and/or one repetition per gap dimension."""
    config = {**DEFAULT_CONFIG, **config}
    all_results = {}

    def result_dict(res):
        return {
            "avg_ll": float(res.average_log_likelihood),
            "avg_lml": float(res.average_lml),
            "mse": float(res.mse_of_means),
            "qce": float(res.qce),
            "sqce": float(res.sqce),
        }

    def tuned(gap):
        if config.get("hpo"):
            return grid_search(config, HPO_GRIDS[config["model"]], gap=gap, log=log)
        return config

    if config.get("plain", True):
        cfg = tuned(None)
        reps = []
        for rep in range(config.get("standard_split_reps", 1)):
            res = run_single({**cfg, "seed": rep}, log=log)
            reps.append(result_dict(res))
        all_results["plain"] = reps

    if config.get("gap", False):
        ds = UCIDataset(config["dataset"])
        gap_results = []
        for gap_split in range(ds.in_dim):
            cfg = tuned(gap_split)
            res = run_single({**cfg, "seed": gap_split}, gap=gap_split, log=log)
            gap_results.append({"gap_split": gap_split, "result": result_dict(res)})
        all_results["gap_results"] = gap_results

    return all_results
