"""Full-batch HMC / SG-MCMC / MFVI experiment entries (the modernized
google-bnn-hmc subtree).

Reference: bnn_hmc/run_hmc.py (chain loop with burn-in, online ensembling
of accepted samples, per-iteration pickle checkpoints + auto-resume),
run_sgmcmc.py (cyclical schedule), run_vi.py. The reference ran
data-parallel via ``pmap`` + ``lax.psum`` over a flat device axis
(train_utils.py:119-164); here the full batch is sharded over the
``data`` axis of a jax.sharding.Mesh and XLA inserts the collectives.

The predictive running average over accepted samples (reference
ensemble_utils.py:19-53) is kept on device.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..evals.classification import EvalResult, analyze_output
from ..methods import LossOutput, hmc_method, mfvi_method, sgmcmc_method
from ..parallel import make_mesh, replicate, shard_batch
from ..utils import checkpoint as ckpt
from ..utils.logging import VoidLog


def xent_loss_fn(model):
    def loss_fn(params, model_state, key, batch):
        x, y = batch
        out, kl, new_state = model.apply(params, model_state, key, x, train=True)
        logp = jax.nn.log_softmax(out, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        return LossOutput(loss=loss, kl=kl, model_state=new_state)

    return loss_fn


@dataclasses.dataclass
class PredictiveAverage:
    """Running average of predictive probabilities over accepted samples
    (reference ensemble_utils.py:24-35)."""

    probs: jax.Array = None
    count: int = 0

    def update(self, new_probs: jax.Array):
        if self.probs is None:
            self.probs = new_probs
            self.count = 1
        else:
            self.count += 1
            self.probs = self.probs + (new_probs - self.probs) / self.count
        return self


def run_hmc(
    model,
    train_batch,
    test_batch,
    n_iterations: int = 100,
    burn_in: int = 10,
    step_size: float = 1e-5,
    n_leapfrog: int = 50,
    prior_std: float = 1.0,
    target_accept_rate: float = 0.8,
    step_size_adaptation_speed: float = 0.05,
    seed: int = 0,
    run_dir: Optional[str] = None,
    init_params=None,
    log=None,
    mesh=None,
    ring_dtype=None,
    ring_sharding=None,
):
    """One HMC chain (reference run_hmc.py:134-191): adaptive step size
    during burn-in, online predictive ensembling of accepted samples,
    preemption-safe checkpointing when ``run_dir`` is set.

    ring_dtype / ring_sharding: draw-ring scaling knobs forwarded to
    hmc_method (methods/rings.py) — bf16 storage and/or sharding the
    flat parameter dimension over a mesh axis for big backbones."""
    log = log or VoidLog()
    if mesh is None:
        mesh = make_mesh(member_parallel=1)
    x, y = train_batch
    example = jnp.asarray(x[:2])

    params, model_state = model.init(jax.random.key(seed), example)
    if init_params is not None:
        # warm start / transplant (reference --init_checkpoint,
        # script_utils.get_initialization_dict)
        params = init_params
    loss_fn = xent_loss_fn(model)
    ring_kw = {}
    if ring_dtype is not None:
        ring_kw["ring_dtype"] = ring_dtype
    if ring_sharding is not None:
        ring_kw["ring_sharding"] = ring_sharding
    method = hmc_method(
        loss_fn,
        dataset_size=x.shape[0],
        step_size=step_size,
        n_leapfrog=n_leapfrog,
        prior_std=prior_std,
        target_accept_rate=target_accept_rate,
        step_size_adaptation_speed=step_size_adaptation_speed,
        **ring_kw,
    )
    state = method.init(jax.random.key(seed + 1), params, model_state)

    # Shard the full batch over the data axis; replicate the chain state.
    train = shard_batch(mesh, (jnp.asarray(x), jnp.asarray(y)))
    state = replicate(mesh, state)
    update = jax.jit(method.update)

    @jax.jit
    def test_predict(params, model_state, xb):
        out, _, _ = model.apply(params, model_state, None, xb, train=False, mutable_state=False)
        return jax.nn.softmax(out, axis=-1)

    start_iter = 0
    if run_dir:
        state, resumed = ckpt.restore_checkpoint(run_dir, state)
        if resumed is not None:
            start_iter = resumed + 1
            log.info(f"resumed from iteration {resumed}")

    ensemble = PredictiveAverage()
    metrics_hist = []
    for it in range(start_iter, n_iterations):
        adapt = it < burn_in
        state, metrics = update(
            state, jax.random.fold_in(jax.random.key(seed + 2), it), train
        )
        if not adapt and bool(metrics["accepted"]):
            probs = test_predict(state.params, state.model_state, jnp.asarray(test_batch[0]))
            ensemble.update(probs)
        m = {k: float(v) for k, v in metrics.items()}
        metrics_hist.append(m)
        log.info(
            f"iter {it}: accept_prob {m['accept_prob']:.3f} "
            f"step_size {m['step_size']:.2e} loglik {m['log_likelihood']:.1f}"
        )
        if run_dir:
            ckpt.save_checkpoint(run_dir, it, state)

    result = {"metrics": metrics_hist, "state": state}
    if ensemble.probs is not None:
        log_marg = jnp.log(jnp.maximum(ensemble.probs, 1e-38))
        correct, conf, ll, _, _ = analyze_output(log_marg, jnp.asarray(test_batch[1]))
        result["eval"] = EvalResult.create(correct, conf, ll).as_dict()
        result["predictive"] = np.asarray(ensemble.probs)
    return result


def run_sgmcmc(
    model,
    train_arrays,
    n_epochs: int = 10,
    batch_size: int = 128,
    step_size: float = 1e-6,
    momentum_decay: float = 0.9,
    temperature: float = 1.0,
    prior_std: float = 1.0,
    preconditioner: Optional[str] = None,
    sample_interval: int = 100,
    seed: int = 0,
    init_params=None,
    log=None,
    ring_dtype=None,
    ring_sharding=None,
):
    """SGLD/SGHMC training loop (reference run_sgmcmc.py).

    ring_dtype / ring_sharding: draw-ring scaling knobs forwarded to
    sgmcmc_method (methods/rings.py)."""
    log = log or VoidLog()
    x, y = train_arrays
    example = jnp.asarray(x[:2])
    params, model_state = model.init(jax.random.key(seed), example)
    if init_params is not None:
        # warm start / transplant (reference --init_checkpoint,
        # script_utils.get_initialization_dict)
        params = init_params
    ring_kw = {}
    if ring_dtype is not None:
        ring_kw["ring_dtype"] = ring_dtype
    if ring_sharding is not None:
        ring_kw["ring_sharding"] = ring_sharding
    method = sgmcmc_method(
        xent_loss_fn(model),
        dataset_size=x.shape[0],
        step_size_fn=step_size,
        momentum_decay=momentum_decay,
        temperature=temperature,
        prior_std=prior_std,
        preconditioner=preconditioner,
        sample_interval=sample_interval,
        **ring_kw,
    )
    state = method.init(jax.random.key(seed + 1), params, model_state)
    update = jax.jit(method.update)
    rng = np.random.RandomState(seed)
    step = 0
    n = (x.shape[0] // batch_size) * batch_size
    for epoch in range(n_epochs):
        order = rng.permutation(x.shape[0])[:n]
        for start in range(0, n, batch_size):
            sel = order[start : start + batch_size]
            step += 1
            state, metrics = update(
                state,
                jax.random.fold_in(jax.random.key(seed + 2), step),
                (jnp.asarray(x[sel]), jnp.asarray(y[sel])),
            )
        log.info(f"epoch {epoch}: loss {float(metrics['loss']):.4f}")
    return method, state


def run_sgd(
    model,
    train_arrays,
    n_epochs: int = 10,
    batch_size: int = 128,
    lr: float = 1e-2,
    momentum: float = 0.9,
    prior_std: float = 1.0,
    schedule: str = "cosine",
    seed: int = 0,
    run_dir: Optional[str] = None,
    init_params=None,
    log=None,
):
    """MAP/SGD training (reference run_sgd.py): the baseline that seeds
    deep ensembles of independently-trained solutions. Gaussian log-prior
    folded into the loss (reference losses.py:53-73 make_gaussian_log_prior
    scaled by 1/N), cosine or constant LR, optional checkpoint/auto-resume."""
    import optax

    from ..methods import map_method

    log = log or VoidLog()
    x, y = train_arrays
    example = jnp.asarray(x[:2])
    params, model_state = model.init(jax.random.key(seed), example)
    if init_params is not None:
        # warm start / transplant (reference --init_checkpoint,
        # script_utils.get_initialization_dict)
        params = init_params
    n_data = x.shape[0]
    base_loss = xent_loss_fn(model)

    def loss_fn(p, ms, key, batch):
        out = base_loss(p, ms, key, batch)
        sq = sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in jax.tree.leaves(p))
        prior = sq / (2 * prior_std**2 * n_data)
        return out._replace(loss=out.loss + prior)

    steps_per_epoch = max(1, n_data // batch_size)
    if schedule == "cosine":
        lr_sched = optax.cosine_decay_schedule(lr, n_epochs * steps_per_epoch)
    else:
        lr_sched = lr
    method = map_method(loss_fn, optax.sgd(lr_sched, momentum=momentum))
    state = method.init(jax.random.key(seed + 1), params, model_state)
    update = jax.jit(method.update)

    start_epoch = 0
    if run_dir:
        state, resumed = ckpt.restore_checkpoint(run_dir, state)
        if resumed is not None:
            start_epoch = resumed + 1
            log.info(f"resumed from epoch {resumed}")

    rng = np.random.RandomState(seed)
    n = steps_per_epoch * batch_size
    step = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, n_epochs):
        order = rng.permutation(x.shape[0])[:n]
        for start in range(0, n, batch_size):
            sel = order[start : start + batch_size]
            step += 1
            state, metrics = update(
                state,
                jax.random.fold_in(jax.random.key(seed + 2), step),
                (jnp.asarray(x[sel]), jnp.asarray(y[sel])),
            )
        log.info(f"epoch {epoch}: loss {float(metrics['loss']):.4f}")
        if run_dir:
            ckpt.save_checkpoint(run_dir, epoch, state)
    return method, state


def run_vi(
    model,
    train_arrays,
    n_epochs: int = 10,
    batch_size: int = 128,
    lr: float = 1e-3,
    prior_std: float = 1.0,
    sigma_init: float = 0.01,
    mc_samples: int = 1,
    temperature: float = 1.0,
    seed: int = 0,
    init_params=None,
    log=None,
):
    """MFVI ELBO training (reference run_vi.py:105-121)."""
    import optax

    log = log or VoidLog()
    x, y = train_arrays
    example = jnp.asarray(x[:2])
    params, model_state = model.init(jax.random.key(seed), example)
    if init_params is not None:
        # warm start / transplant (reference --init_checkpoint,
        # script_utils.get_initialization_dict)
        params = init_params
    method = mfvi_method(
        xent_loss_fn(model),
        optax.adam(lr),
        dataset_size=x.shape[0],
        prior_std=prior_std,
        sigma_init=sigma_init,
        mc_samples=mc_samples,
        temperature=temperature,
    )
    state = method.init(jax.random.key(seed + 1), params, model_state)
    update = jax.jit(method.update)
    rng = np.random.RandomState(seed)
    step = 0
    n = (x.shape[0] // batch_size) * batch_size
    for epoch in range(n_epochs):
        order = rng.permutation(x.shape[0])[:n]
        for start in range(0, n, batch_size):
            sel = order[start : start + batch_size]
            step += 1
            state, metrics = update(
                state,
                jax.random.fold_in(jax.random.key(seed + 2), step),
                (jnp.asarray(x[sel]), jnp.asarray(y[sel])),
            )
        log.info(
            f"epoch {epoch}: loss {float(metrics['loss']):.4f} kl {float(metrics['kl']):.1f}"
        )
    return method, state
