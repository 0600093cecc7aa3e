"""Layer-level tests: BBB local reparameterization statistics, frozen eval
noise, Rank-1 factors, GaussLayer packing, FixableDropout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.nn import (
    BBBConv,
    BBBDense,
    FilterResponseNorm,
    FixableDropout,
    GaussLayer,
    Model,
    Rank1Dense,
    VariationalFilterResponseNorm,
)
from beyond_deep_ensembles_tpu.methods.api import (
    collect_gaussian_kl,
    GaussianPrior,
    split_gaussian_labels,
)


def _run(module, x, train=True, seed=0, **kw):
    model = Model(module)
    params, state = model.init(jax.random.key(seed), x)
    out, kl, _ = model.apply(params, state, jax.random.key(seed + 1), x, train=train, **kw)
    return params, out, kl


def test_bbb_dense_moments():
    """Sampled activations should match the analytic mean/var of the local
    reparameterization (reference bbb_layers.py:61-80)."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (4, 16)) + 1.0
    layer = BBBDense(8)
    model = Model(layer)
    params, state = model.init(jax.random.key(1), x)

    mean = params["kernel__gmean"]
    std = jax.nn.softplus(params["kernel__grho"])
    b_mean = params["bias__gmean"]
    b_std = jax.nn.softplus(params["bias__grho"])

    exp_mean = x @ mean + b_mean
    exp_var = (
        jnp.maximum(x**2, 1e-4) @ jnp.maximum(std**2, 1e-4)
        + jnp.maximum(b_std**2, 1e-4)
    )

    keys = jax.random.split(jax.random.key(10), 3000)
    outs = jax.jit(
        jax.vmap(lambda k: model.apply(params, state, k, x, train=True)[0])
    )(keys)
    np.testing.assert_allclose(outs.mean(0), exp_mean, atol=0.02)
    np.testing.assert_allclose(outs.var(0), exp_var, rtol=0.15)


def test_bbb_dense_freeze_on_eval():
    """At eval, noise is shared across the batch: two identical inputs get
    identical outputs (reference bbb_layers.py:76-78)."""
    x = jnp.ones((2, 16))
    layer = BBBDense(8, freeze_on_eval=True)
    model = Model(layer)
    params, state = model.init(jax.random.key(0), x)
    out, _, _ = model.apply(params, state, jax.random.key(5), x, train=False)
    np.testing.assert_allclose(out[0], out[1], rtol=1e-6)
    # but in train mode the two rows see independent noise
    out_t, _, _ = model.apply(params, state, jax.random.key(5), x, train=True)
    assert not np.allclose(out_t[0], out_t[1])


def test_bbb_conv_runs_and_freezes():
    x = jnp.ones((2, 8, 8, 3))
    model = Model(BBBConv(4, (3, 3), padding=1))
    params, state = model.init(jax.random.key(0), x)
    out, _, _ = model.apply(params, state, jax.random.key(1), x, train=False)
    assert out.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(out[0], out[1], rtol=1e-5)


def test_bbb_conv_parameters_sampling_moments():
    """sampling='parameters' (our extension — the reference declares but
    never implements it for conv, bbb_layers.py:142-143): explicit weight
    draws must reproduce the local-reparameterization moments wherever the
    activations path's 1e-4 clamps are inactive."""
    key = jax.random.key(0)
    # inputs well above the sqrt(1e-4)=0.01 clamp scale
    x = jax.random.normal(key, (2, 6, 6, 3)) + 2.0
    model = Model(BBBConv(4, (3, 3), padding=1, sampling="parameters"))
    params, state = model.init(jax.random.key(1), x)

    w_mean = params["kernel__gmean"]
    w_std = jax.nn.softplus(params["kernel__grho"])
    b_mean = params["bias__gmean"]
    b_std = jax.nn.softplus(params["bias__grho"])

    def conv(lhs, rhs):
        return jax.lax.conv_general_dilated(
            lhs, rhs, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    exp_mean = conv(x, w_mean) + b_mean
    exp_var = conv(x**2, w_std**2) + b_std**2

    keys = jax.random.split(jax.random.key(10), 4000)
    outs = jax.jit(
        jax.vmap(lambda k: model.apply(params, state, k, x, train=True)[0])
    )(keys)
    np.testing.assert_allclose(outs.mean(0), exp_mean, atol=0.05)
    np.testing.assert_allclose(outs.var(0), exp_var, rtol=0.2, atol=1e-4)

    with pytest.raises(ValueError, match="sampling"):
        m = Model(BBBConv(4, (3, 3), padding=1, sampling="bogus"))
        p, s = m.init(jax.random.key(0), x)


def test_gaussian_labels_and_kl():
    x = jnp.ones((2, 16))
    model = Model(BBBDense(8))
    params, _ = model.init(jax.random.key(0), x)
    labels = split_gaussian_labels(params)
    assert set(jax.tree.leaves(labels)) == {"gmean", "grho"}
    prior = GaussianPrior(0.0, 1.0)
    kl = collect_gaussian_kl(params, prior)
    # manual closed form
    ref = prior.kl_divergence(
        params["kernel__gmean"], jax.nn.softplus(params["kernel__grho"])
    ) + prior.kl_divergence(params["bias__gmean"], jax.nn.softplus(params["bias__grho"]))
    np.testing.assert_allclose(float(kl), float(ref), rtol=1e-6)
    assert float(kl) > 0


def test_rank1_dense_components():
    x = jnp.ones((2, 16))
    model = Model(Rank1Dense(4, components=3))
    params, state = model.init(jax.random.key(0), x)
    assert params["s__gmean"].shape == (3, 16)
    assert params["bias"].shape == (3, 4)
    # sign init means are exactly +-1
    assert set(np.unique(np.asarray(params["s__gmean"]))) <= {-1.0, 1.0}
    o0, _, _ = model.apply(params, state, jax.random.key(1), x, component=0)
    o2, _, _ = model.apply(params, state, jax.random.key(1), x, component=2)
    assert o0.shape == (2, 4)
    assert not np.allclose(o0, o2)  # different component -> different bias/factors


def test_gauss_layer_packs_mean_std():
    x = jnp.asarray([[1.5], [-2.0]])
    model = Model(GaussLayer(std_init=0.7))
    params, state = model.init(jax.random.key(0), x)
    out, _, _ = model.apply(params, state, None, x)
    assert out.shape == (2, 1, 2)
    np.testing.assert_allclose(out[..., 0], x, rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], 0.7, rtol=1e-5)
    assert params == {}  # fixed variance -> no learnable params

    model_lv = Model(GaussLayer(std_init=0.7, learn_var=True))
    params_lv, _ = model_lv.init(jax.random.key(0), x)
    assert "rho__mle" in params_lv


def test_fixable_dropout():
    x = jnp.ones((4, 64))
    model = Model(FixableDropout(0.5, freeze_on_eval=True))
    params, state = model.init(jax.random.key(0), x)
    # eval + freeze: mask shared across batch, NOT rescaled (reference quirk)
    out, _, _ = model.apply(params, state, jax.random.key(3), x, train=False)
    np.testing.assert_allclose(out[0], out[3])
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
    # train: rescaled by 1/keep
    out_t, _, _ = model.apply(params, state, jax.random.key(3), x, train=True)
    assert set(np.unique(np.asarray(out_t))) <= {0.0, 2.0}


def test_frn_shapes_and_variational_kl_labels():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 5))
    model = Model(FilterResponseNorm())
    params, state = model.init(jax.random.key(1), x)
    out, _, _ = model.apply(params, state, None, x)
    assert out.shape == x.shape

    vmodel = Model(VariationalFilterResponseNorm())
    vparams, vstate = vmodel.init(jax.random.key(1), x)
    labels = set(jax.tree.leaves(split_gaussian_labels(vparams)))
    assert labels == {"gmean", "grho"}
    out, _, _ = vmodel.apply(vparams, vstate, jax.random.key(2), x, train=False)
    assert out.shape == x.shape
