"""Activation-remat knobs on the conv backbones (models/densenet.py,
models/resnet.py ``remat`` field).

Remat must be a pure performance transform: identical parameter tree
(flat DenseLayer_{k} / Bottleneck_{k} naming — checkpoint converters
depend on it), identical forward values, identical gradients (it
re-runs the same ops in the backward pass). These pins let the engine
flip ``conv_remat`` per-hardware without any parity risk.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.models.densenet import DenseNetClassifier
from beyond_deep_ensembles_tpu.models.resnet import ResNet50


def _paths(tree):
    return sorted(
        "/".join(str(k.key) for k in p)
        for p, _ in jax.tree_util.tree_leaves_with_path(tree)
    )


def _loss_and_grad(model, variables, x):
    @jax.jit
    def lg(v):
        def loss(v):
            out = model.apply(v, x, train=True)
            return jnp.sum(out**2)

        return jax.value_and_grad(loss)(v)

    return lg(variables)


@pytest.mark.parametrize("remat", ["layer", "block"])
def test_densenet_remat_is_pure_perf_transform(remat):
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    base = DenseNetClassifier(
        classes=4, growth_rate=4, block_config=(2, 2), init_features=8, bn_size=2
    )
    v = base.init(jax.random.key(1), x, train=True)
    other = base.clone(remat=remat)
    # same init => same tree structure and flat naming
    v2 = other.init(jax.random.key(1), x, train=True)
    assert _paths(v) == _paths(v2)

    l0, g0 = _loss_and_grad(base, v, x)
    l1, g1 = _loss_and_grad(other, v, x)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("remat", ["block", "stage"])
def test_resnet50_remat_is_pure_perf_transform(remat):
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    base = ResNet50(classes=4, stage_sizes=(1, 1), torchvision=True)
    v = base.init(jax.random.key(1), x, train=True)
    other = base.clone(remat=remat)
    v2 = other.init(jax.random.key(1), x, train=True)
    assert _paths(v) == _paths(v2)

    l0, g0 = _loss_and_grad(base, v, x)
    l1, g1 = _loss_and_grad(other, v, x)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_densenet_incremental_bn_exact():
    """incremental_bn reuses per-channel batch stats across the dense
    block (models/densenet.py) — it must be EXACT: same params, same
    forward, same gradients as recomputing full-tensor stats each layer,
    in train and eval, with and without dropout."""
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    for drop_p in (None, 0.2):
        base = DenseNetClassifier(
            classes=4, growth_rate=4, block_config=(2, 2), init_features=8,
            bn_size=2, dropout_p=drop_p, incremental_bn=False,
        )
        inc = base.clone(incremental_bn=True)
        rngs = {"params": jax.random.key(1), "dropout": jax.random.key(2)}
        v = base.init(rngs, x, train=True)
        assert _paths(v) == _paths(inc.init(rngs, x, train=True))

        for train in (True, False):
            kw = dict(train=train, rngs={"dropout": jax.random.key(3)})
            np.testing.assert_allclose(
                np.asarray(base.apply(v, x, **kw)),
                np.asarray(inc.apply(v, x, **kw)),
                rtol=1e-5, atol=1e-5,
            )

        def loss(m, v):
            out = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(3)})
            return jnp.sum(out**2)

        g0 = jax.jit(jax.grad(lambda v: loss(base, v)))(v)
        g1 = jax.jit(jax.grad(lambda v: loss(inc, v)))(v)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_remat_ignored_under_component_index():
    """Mixture paths (rank-1/MultiX) thread a component index; remat is
    documented to fall back to 'none' there rather than lift the capture."""
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    m = DenseNetClassifier(
        classes=3,
        growth_rate=4,
        block_config=(2,),
        init_features=8,
        bn_size=2,
        conv_kind="rank1",
        head_kind="rank1",
        components=2,
        remat="block",
    )
    rngs = {"params": jax.random.key(1), "noise": jax.random.key(2)}
    v = m.init(rngs, x, train=True)
    out = m.apply(v, x, train=True, component=1, rngs={"noise": jax.random.key(3)})
    assert out.shape == (2, 3)


def test_nonorm_decomposition_variants_build():
    """The *_nonorm benchmark decomposition knob (no_norm config ->
    DenseNet norm_off / ResNet norm='none') must build and run a finite
    forward — it exists so big_backbones can MEASURE the norm/elementwise
    share of the conv step, never as a training default."""
    from beyond_deep_ensembles_tpu.models.resnet import ResNet50

    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    dn = DenseNetClassifier(
        classes=4, growth_rate=4, block_config=(2, 2), init_features=8,
        bn_size=2, norm_off=True,
    )
    v = dn.init(jax.random.key(1), x, train=True)
    out = dn.apply(v, x, train=True)
    assert out.shape == (2, 4) and bool(jnp.all(jnp.isfinite(out)))
    # no BN parameters may exist in the no-norm variant
    assert not any("BatchNorm" in p or "_BN" in p for p in _paths(v))

    rn = ResNet50(classes=4, norm="none", stage_sizes=(1, 1))
    v = rn.init(jax.random.key(1), x, train=True)
    out = rn.apply(v, x, train=True)
    assert out.shape == (2, 4) and bool(jnp.all(jnp.isfinite(out)))


def test_densenet_buffer_concat_mode_exact():
    """concat_mode='buffer' (preallocated block tensor + static-offset
    dynamic_update_slice) must be EXACT vs the concat chain: same param
    paths, same forward, same gradients — it only changes how XLA lays
    out the dense block's growing feature tensor."""
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    base = DenseNetClassifier(
        classes=4, growth_rate=4, block_config=(2, 3), init_features=8,
        bn_size=2, concat_mode="concat",
    )
    buf = base.clone(concat_mode="buffer")
    v = base.init(jax.random.key(1), x, train=True)
    assert _paths(v) == _paths(buf.init(jax.random.key(1), x, train=True))

    for train in (True, False):
        np.testing.assert_allclose(
            np.asarray(base.apply(v, x, train=train)),
            np.asarray(buf.apply(v, x, train=train)),
            rtol=1e-6, atol=1e-6,
        )

    def loss(m, v):
        return jnp.sum(m.apply(v, x, train=True) ** 2)

    g0 = jax.jit(jax.grad(lambda v: loss(base, v)))(v)
    g1 = jax.jit(jax.grad(lambda v: loss(buf, v)))(v)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
