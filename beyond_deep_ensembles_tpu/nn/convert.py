"""Deterministic -> Bayesian parameter-tree conversion.

Reference ``make_module_bbb`` / ``make_module_rank1`` (src/algos/
bbb_layers.py:278-300, rank1.py:127-149) rewrite trained nn.Modules in
place, seeding variational means from the trained weights. Functionally,
the architecture swap is just choosing ``conv_kind='bbb'|'rank1'`` when
building the model; what remains is copying a trained PLAIN checkpoint
into the Bayesian model's parameter tree — that is what these functions
do.

Matching rule: a plain leaf ``.../kernel`` (or ``bias``) initializes the
Bayesian model's ``.../kernel__gmean``; rho leaves keep their init
(Blundell rho = -3). Rank-1 models keep the plain kernel as the shared
deterministic kernel and initialize the per-component bias rows from the
plain bias.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..methods.api import GMEAN_SUFFIX


def _flat(params):
    return {
        tuple(getattr(p, "key", str(p)) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def init_bbb_from_plain(bbb_params, plain_params):
    """Copy trained plain weights into the Gaussian means of a BBB model
    built from the same architecture (reference make_module_bbb seeds
    ``weight.mean`` from ``m.weight.data``, bbb_layers.py:289-297).

    Matching: exact path match for untouched leaves; for ``__gmean``
    leaves, the plain tree's same-base-name leaves (kernel/bias) are
    consumed IN TRAVERSAL ORDER with shape checks — BBB layers live in
    differently-named scopes (``BBBDense_0`` vs ``Dense_0``) so paths
    cannot match directly."""
    plain = _flat(plain_params)
    # base name -> ordered list of (path, leaf) not already path-matched
    by_base: dict = {}
    for names, leaf in plain.items():
        by_base.setdefault(names[-1], []).append((names, leaf))

    def fill(path, leaf):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        name = names[-1]
        if name.endswith(GMEAN_SUFFIX):
            base = name[: -len(GMEAN_SUFFIX)]
            src = names[:-1] + (base,)
            if src in plain and plain[src].shape == leaf.shape:
                return jnp.asarray(plain[src], leaf.dtype)
            for i, (cand_path, cand) in enumerate(by_base.get(base, [])):
                if cand.shape == leaf.shape:
                    by_base[base].pop(i)
                    return jnp.asarray(cand, leaf.dtype)
        elif names in plain and plain[names].shape == leaf.shape:
            return jnp.asarray(plain[names], leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fill, bbb_params)


def init_rank1_from_plain(rank1_params, plain_params):
    """Copy trained plain weights into a Rank-1 model: the shared kernel
    takes the plain kernel, the per-component bias rows all take the
    plain bias (reference make_module_rank1 reuses the module and
    overwrites the bias mean, rank1.py:136-147)."""
    plain = _flat(plain_params)

    def fill(path, leaf):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        name = names[-1]
        if names in plain and plain[names].shape == leaf.shape:
            return jnp.asarray(plain[names], leaf.dtype)
        if name == "bias" and leaf.ndim == 2:  # [components, out]
            src = names[:-1] + ("bias",)
            if src in plain and plain[src].shape == leaf.shape[1:]:
                return jnp.broadcast_to(
                    jnp.asarray(plain[src], leaf.dtype), leaf.shape
                )
        return leaf

    return jax.tree_util.tree_map_with_path(fill, rank1_params)
