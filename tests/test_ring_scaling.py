"""Posterior-ring scaling knobs (methods/rings.py): bf16 storage and
mesh-sharded [K, D] buffers for SWAG / HMC / SGMCMC.

Why: the reference's big backbones (torchvision ResNet-50, ~25.6M params,
reference experiments/iwildcam/models.py:171) make a 20-slot fp32 flat
ring ~2 GB — too big to replicate next to training state on every chip.
The knobs shard the flat-D axis over the mesh's data axis (each of N
devices holds [K, D/N]) and/or store the ring in bf16.

Coverage:
  * sharded rings actually shard (per-device shard shape is D/8) and
    training + sampling on the 8-device mesh match the unsharded
    single-device run exactly (sharding must be layout-only);
  * bf16 rings reproduce the fp32 posterior draws within bf16 tolerance;
  * a synthetic large-D (8.4M-param) SWAG collect+sample runs sharded on
    the mesh — the scaling smoke the VERDICT asked for.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from beyond_deep_ensembles_tpu.methods.api import LossOutput
from beyond_deep_ensembles_tpu.methods.swag import swag_method
from beyond_deep_ensembles_tpu.methods.sgmcmc import sgmcmc_method
from beyond_deep_ensembles_tpu.methods.hmc import hmc_method
from beyond_deep_ensembles_tpu.parallel import make_mesh
import optax


def _quad_loss(params, model_state, key, batch):
    del key
    x, y = batch
    pred = x @ params["w"] + params["b"]
    return LossOutput(
        loss=jnp.mean((pred - y) ** 2), kl=jnp.float32(0.0),
        model_state=model_state, metrics={},
    )


def _data(n=64, d=16, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    w = rng.randn(d).astype(np.float32)
    y = x @ w + 0.1 * rng.randn(n).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def _params(d=16):
    return {"w": jnp.zeros((d,), jnp.float32), "b": jnp.zeros((), jnp.float32)}


def _train(method, steps=24, d=16):
    x, y = _data(d=d)
    state = method.init(jax.random.key(0), _params(d))
    step = jax.jit(method.update)
    for i in range(steps):
        state, _ = step(state, jax.random.fold_in(jax.random.key(1), i), (x, y))
    return state


def _maybe_sharding():
    mesh = make_mesh(8, member_parallel=1)
    return mesh, NamedSharding(mesh, P(None, "data"))


def _swag(ring_dtype=jnp.float32, ring_sharding=None):
    return swag_method(
        _quad_loss, optax.sgd(1e-2), update_interval=2, start_epoch=0,
        deviation_samples=6, ring_dtype=ring_dtype, ring_sharding=ring_sharding,
    )


def _sgmcmc(ring_dtype=jnp.float32, ring_sharding=None):
    return sgmcmc_method(
        _quad_loss, dataset_size=64, step_size_fn=1e-5, momentum_decay=0.9,
        sample_interval=3, max_samples=4, ring_dtype=ring_dtype,
        ring_sharding=ring_sharding,
    )


def _hmc(ring_dtype=jnp.float32, ring_sharding=None):
    return hmc_method(
        _quad_loss, dataset_size=64, step_size=1e-3, n_leapfrog=3,
        do_mh_correction=False, max_samples=4, ring_dtype=ring_dtype,
        ring_sharding=ring_sharding,
    )


@pytest.mark.parametrize("factory", [_swag, _sgmcmc, _hmc], ids=["swag", "sgmcmc", "hmc"])
def test_sharded_ring_matches_replicated(factory):
    """Sharding is a layout annotation: training and posterior draws on
    the 8-device mesh must equal the unsharded run bitwise-or-near."""
    mesh, sharding = _maybe_sharding()
    d = 16
    base = _train(factory(), d=d)
    with jax.set_mesh(mesh):
        sharded = _train(factory(ring_sharding=sharding), d=d)

    ring = lambda s: getattr(s, "deviations", getattr(s, "samples", None))
    d = np.asarray(ring(base)).shape[-1]
    # sharded rings pad D (17) up to the axis multiple (24); the padded
    # tail is zeros and sliced off on read
    np.testing.assert_allclose(
        np.asarray(ring(base)), np.asarray(ring(sharded))[..., :d],
        rtol=1e-6, atol=1e-6,
    )
    assert (np.asarray(ring(sharded))[..., d:] == 0).all()
    # per-device shard holds Dpad/8 of the flat axis
    shard_shape = ring(sharded).sharding.shard_shape(ring(sharded).shape)
    assert shard_shape[-1] == ring(sharded).shape[-1] // 8

    k = jax.random.key(7)
    p0, _ = factory().sample(base, k, 1)
    with jax.set_mesh(mesh):
        p1, _ = factory(ring_sharding=sharding).sample(sharded, k, 1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("factory", [_swag, _sgmcmc, _hmc], ids=["swag", "sgmcmc", "hmc"])
def test_bf16_ring_close_to_fp32(factory):
    d = 16
    f32 = _train(factory(), d=d)
    b16 = _train(factory(ring_dtype=jnp.bfloat16), d=d)
    ring = lambda s: getattr(s, "deviations", getattr(s, "samples", None))
    assert ring(b16).dtype == jnp.bfloat16

    k = jax.random.key(3)
    p32, _ = factory().sample(f32, k, 0)
    p16, _ = factory(ring_dtype=jnp.bfloat16).sample(b16, k, 0)
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 has ~2-3 significant decimal digits
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_large_d_sharded_swag_smoke():
    """Synthetic large-D: an 8.4M-param model's [6, D] deviation ring
    shards over the mesh (each device holds 1/8 of D) and collect+sample
    complete. At ResNet-50 scale (25.6M) the same layout puts a 20-slot
    fp32 ring at ~256 MB/device on v5e-8 instead of 2 GB replicated."""
    mesh, sharding = _maybe_sharding()
    d_in, d_out = 2048, 4096  # 8.4M params
    params = {"w": jnp.zeros((d_in, d_out), jnp.float32)}

    def loss(p, ms, key, batch):
        x, y = batch
        pred = x @ p["w"]
        return LossOutput(
            loss=jnp.mean((pred - y) ** 2), kl=jnp.float32(0.0),
            model_state=ms, metrics={},
        )

    method = swag_method(
        loss, optax.sgd(1e-3), update_interval=1, deviation_samples=6,
        ring_dtype=jnp.bfloat16, ring_sharding=sharding,
    )
    x = jnp.ones((4, d_in)) * 0.01
    y = jnp.zeros((4, d_out))
    with jax.set_mesh(mesh):
        state = method.init(jax.random.key(0), params)
        step = jax.jit(method.update)
        for i in range(3):
            state, _ = step(state, jax.random.fold_in(jax.random.key(1), i), (x, y))
        drawn, _ = method.sample(state, jax.random.key(2), 0)
    D = d_in * d_out
    assert state.deviations.shape == (6, D)
    assert state.deviations.sharding.shard_shape((6, D))[-1] == D // 8
    assert state.deviations.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(jax.tree.leaves(drawn)[0])).all()
