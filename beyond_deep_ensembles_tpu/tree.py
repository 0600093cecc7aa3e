"""Pytree utilities.

TPU-native replacements for the reference's flat-vector plumbing
(``parameters_to_vector`` / ``vector_to_parameters``, reference
src/algos/swag.py:3, src/algos/svgd.py:83-84) and for the JAX-subtree tree
helpers (reference google-bnn-hmc/bnn_hmc/utils/tree_utils.py:35-76).

All functions are jit/vmap-safe. ``ravel`` intentionally avoids
``jax.flatten_util.ravel_pytree`` on the vmapped paths: we flatten by
reshape+concatenate so a stacked particle axis maps straight through
``vmap`` (SVGD flattens each particle inside one jitted step).
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = Any
PyTree = Any


def tree_size(tree: PyTree) -> int:
    """Total number of elements across all leaves."""
    return sum(math.prod(l.shape) for l in jax.tree.leaves(tree))


def ravel(tree: PyTree, dtype=jnp.float32) -> jax.Array:
    """Flatten a pytree to one 1-D vector (vmap-safe over leading axes).

    Leaves are flattened in ``jax.tree.leaves`` order and concatenated.
    Use :func:`make_unravel` (built on static shapes) to invert.
    """
    leaves = jax.tree.leaves(tree)
    return jnp.concatenate([l.reshape(-1).astype(dtype) for l in leaves])


def make_unravel(template: PyTree) -> Callable[[jax.Array], PyTree]:
    """Return ``unravel(vec) -> pytree`` matching ``template``'s structure.

    The returned function is jit/vmap-safe (all shapes static) and casts
    each leaf back to the template leaf's dtype.
    """
    leaves, treedef = jax.tree.flatten(template)
    shapes = [l.shape for l in leaves]
    dtypes = [l.dtype for l in leaves]
    sizes = [math.prod(s) for s in shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)

    def unravel(vec: jax.Array) -> PyTree:
        out = []
        for i, (shape, dtype) in enumerate(zip(shapes, dtypes)):
            seg = jax.lax.dynamic_slice_in_dim(vec, offsets[i], sizes[i])
            out.append(seg.reshape(shape).astype(dtype))
        return jax.tree.unflatten(treedef, out)

    return unravel


def normal_like(key: jax.Array, tree: PyTree) -> PyTree:
    """Standard-normal pytree with the same shapes/dtypes as ``tree``.

    Replaces reference ``normal_like`` (src/algos/util.py:185-186) and
    ``normal_like_tree`` (bnn_hmc/utils/tree_utils.py).
    """
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef,
        [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


def tree_add(a: PyTree, b: PyTree, scale=1.0) -> PyTree:
    """a + scale * b, leafwise."""
    return jax.tree.map(lambda x, y: x + scale * y, a, b)


def tree_sub(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree.map(lambda x, y: x - y, a, b)


def tree_scale(a: PyTree, s) -> PyTree:
    return jax.tree.map(lambda x: s * x, a)


def tree_dot(a: PyTree, b: PyTree) -> jax.Array:
    """Inner product of two pytrees (fp32 accumulation)."""
    parts = jax.tree.map(
        lambda x, y: jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)), a, b
    )
    return jax.tree.reduce(jnp.add, parts, jnp.float32(0.0))


def tree_sq_norm(a: PyTree) -> jax.Array:
    return tree_dot(a, a)


def tree_zeros_like(a: PyTree) -> PyTree:
    return jax.tree.map(jnp.zeros_like, a)


def tree_cast(a: PyTree, dtype) -> PyTree:
    return jax.tree.map(lambda x: x.astype(dtype), a)


def tree_where(pred, a: PyTree, b: PyTree) -> PyTree:
    """Select a whole pytree by a scalar predicate (NaN-guard updates,
    reference bbb.py:81 skips the step when the loss is NaN)."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_stack(trees: list[PyTree]) -> PyTree:
    """Stack a list of pytrees along a new leading axis (ensemble/particle
    axis; replaces the reference's list-of-models, ensemble.py:14)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *trees)


def tree_unstack(tree: PyTree, n: int) -> list[PyTree]:
    return [jax.tree.map(lambda l: l[i], tree) for i in range(n)]
