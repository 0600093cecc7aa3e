"""Posterior / loss-surface plane evaluation.

Reference: bnn_hmc/make_posterior_surface_plot.py — evaluate the loss
(or log-density) on the 2-D plane spanned by three parameter vectors
(e.g. three posterior samples or checkpoints), Garipov-et-al style.
TPU-native: every grid point is one vmapped loss evaluation — the whole
plane is ONE jitted program.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .. import tree


def plane_basis(p0, p1, p2):
    """Orthonormal basis (u, v) of the plane through three param pytrees,
    plus the in-plane coordinates of the three anchors."""
    d1 = tree.ravel(tree.tree_sub(p1, p0))
    d2 = tree.ravel(tree.tree_sub(p2, p0))
    u = d1 / jnp.linalg.norm(d1)
    d2_orth = d2 - (d2 @ u) * u
    v = d2_orth / jnp.linalg.norm(d2_orth)
    coords = jnp.asarray(
        [[0.0, 0.0], [d1 @ u, 0.0], [d2 @ u, d2 @ v]]
    )
    return u, v, coords


def loss_surface(
    loss_of_params: Callable,
    p0,
    p1,
    p2,
    grid: int = 20,
    margin: float = 0.2,
):
    """Evaluate ``loss_of_params(params) -> scalar`` on a grid x grid
    plane spanned by (p0, p1, p2). Returns (xs, ys, values, anchor_coords).
    """
    u, v, coords = plane_basis(p0, p1, p2)
    base = tree.ravel(p0)
    unravel = tree.make_unravel(p0)

    lo = coords.min(axis=0)
    hi = coords.max(axis=0)
    span = hi - lo
    xs = jnp.linspace(lo[0] - margin * span[0], hi[0] + margin * span[0], grid)
    ys = jnp.linspace(lo[1] - margin * span[1], hi[1] + margin * span[1], grid)

    def at(xy):
        vec = base + xy[0] * u + xy[1] * v
        return loss_of_params(unravel(vec))

    pts = jnp.stack(jnp.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
    values = jax.lax.map(at, pts, batch_size=min(64, grid * grid)).reshape(grid, grid)
    return xs, ys, values, coords
