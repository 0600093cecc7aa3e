import jax
import jax.numpy as jnp
import numpy as np

from beyond_deep_ensembles_tpu import tree


def _params():
    return {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": {"w": jnp.ones((4,), jnp.float32) * 2, "c": jnp.float32(5.0).reshape(())},
    }


def test_ravel_unravel_roundtrip():
    p = _params()
    vec = tree.ravel(p)
    assert vec.shape == (11,)
    back = tree.make_unravel(p)(vec)
    for x, y in zip(jax.tree.leaves(p), jax.tree.leaves(back)):
        np.testing.assert_allclose(x, y)


def test_ravel_vmappable():
    p = _params()
    stacked = jax.tree.map(lambda l: jnp.stack([l, 2 * l, 3 * l]), p)
    mat = jax.vmap(tree.ravel)(stacked)
    assert mat.shape == (3, 11)
    np.testing.assert_allclose(mat[1], 2 * mat[0])
    unravel = tree.make_unravel(p)
    back = jax.vmap(unravel)(mat)
    np.testing.assert_allclose(back["a"][2], 3 * p["a"])


def test_tree_math():
    p = _params()
    z = tree.tree_zeros_like(p)
    assert float(tree.tree_sq_norm(z)) == 0.0
    s = tree.tree_add(p, p, scale=2.0)
    np.testing.assert_allclose(s["a"], 3 * p["a"])
    assert tree.tree_size(p) == 11
    d = tree.tree_dot(p, p)
    expected = sum(float(jnp.sum(l**2)) for l in jax.tree.leaves(p))
    np.testing.assert_allclose(float(d), expected, rtol=1e-6)


def test_tree_where():
    p = _params()
    q = tree.tree_scale(p, -1.0)
    out = tree.tree_where(jnp.bool_(False), p, q)
    np.testing.assert_allclose(out["a"], -p["a"])


def test_normal_like_shapes():
    p = _params()
    n = tree.normal_like(jax.random.key(0), p)
    assert jax.tree.structure(n) == jax.tree.structure(p)
    for a, b in zip(jax.tree.leaves(n), jax.tree.leaves(p)):
        assert a.shape == b.shape


def test_stack_unstack():
    p = _params()
    st = tree.tree_stack([p, tree.tree_scale(p, 2.0)])
    assert st["a"].shape == (2, 2, 3)
    back = tree.tree_unstack(st, 2)
    np.testing.assert_allclose(back[1]["a"], 2 * p["a"])
