"""Wilson-et-al HMC posterior-sample baseline.

Reference src/wilson.py:22-57 + google-bnn-hmc: loads the published HMC
sample checkpoints (3 chains x ~241-261 pickle files of haiku ResNet-20
-FRN-swish parameter trees) and evaluates them to produce the
"ground-truth" posterior predictive that CIFAR eval compares against
(agreement / total variation, experiments/cifar/cifar.py:105-121).

TPU-native: no torch<->jax bridge (reference wilson.py:34-45 round-trips
through numpy per batch). Samples are converted once into OUR flax
ResNet-20 parameter layout (order/shape-based tree matching: both are
the same architecture traversed in topological order; haiku convs are
HWIO like flax, FRN params reshape (1,1,1,C)->(C,)), stacked on a sample
axis, and the predictive runs as one vmapped jitted program.

Checkpoints: ``$BDE_DATA_DIR/wilson_hmc/chain{c}/*.pkl``; a hermetic
fallback generates a few random parameter draws so the agreement/TV
pipeline stays exercisable.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.resnet import ResNet20
from ..nn.base import Model
from ..tree import tree_stack
from .uci import data_dir


def _flatten_leaves_with_shapes(tree):
    return [(np.asarray(l), np.asarray(l).shape) for l in jax.tree.leaves(tree)]


def convert_sample_to_flax(sample_tree, flax_template) -> dict:
    """Order/shape-based conversion of one haiku ResNet-20 param tree into
    our flax ResNet-20 layout. Leaves are matched greedily in traversal
    order with reshape for the FRN (1,1,1,C) vs (C,) convention."""
    src = [np.asarray(l) for l in jax.tree.leaves(sample_tree)]
    tgt_leaves, treedef = jax.tree.flatten(flax_template)
    used = [False] * len(src)
    out = []
    for tgt in tgt_leaves:
        tgt_shape = tuple(tgt.shape)
        found = None
        for i, s in enumerate(src):
            if used[i]:
                continue
            if tuple(s.shape) == tgt_shape:
                found = s
            elif s.size == tgt.size and s.squeeze().shape == np.zeros(tgt_shape).squeeze().shape:
                found = s.reshape(tgt_shape)
            if found is not None:
                used[i] = True
                break
        if found is None:
            raise ValueError(f"no source leaf matches target shape {tgt_shape}")
        out.append(jnp.asarray(found, jnp.float32))
    return jax.tree.unflatten(treedef, out)


class WilsonHMC:
    """Reference WilsonHMC (src/wilson.py:22-57): posterior predictive of
    the published HMC chains on CIFAR-10 batches."""

    def __init__(self, max_samples_per_chain: Optional[int] = None, seed: int = 0):
        self.model = Model(
            ResNet20(classes=10, activation="swish", norm="frn", conv_kind="plain")
        )
        example = jnp.zeros((1, 32, 32, 3), jnp.float32)
        template, self._model_state = self.model.init(jax.random.key(seed), example)

        samples = self._load_samples(template, max_samples_per_chain, seed)
        self._stacked = tree_stack(samples)
        self.n_samples = len(samples)

        def forward_one(params, x):
            out, _, _ = self.model.apply(
                params, self._model_state, None, x, train=False, mutable_state=False
            )
            return jax.nn.log_softmax(out, axis=-1)

        self._predict = jax.jit(jax.vmap(forward_one, in_axes=(0, None)))

    def _load_samples(self, template, max_per_chain, seed) -> List[dict]:
        root = os.path.join(data_dir(), "wilson_hmc")
        samples = []
        if os.path.isdir(root):
            for chain in sorted(os.listdir(root)):
                cdir = os.path.join(root, chain)
                if not os.path.isdir(cdir):
                    continue
                files = sorted(os.listdir(cdir))
                if max_per_chain:
                    files = files[:max_per_chain]
                for f in files:
                    with open(os.path.join(cdir, f), "rb") as fh:
                        ckpt = pickle.load(fh)
                    # bnn_hmc checkpoints store {'params': tree, ...}
                    tree = ckpt.get("params", ckpt) if isinstance(ckpt, dict) else ckpt
                    samples.append(convert_sample_to_flax(tree, template))
        if not samples:
            # Hermetic fallback: a few perturbed draws around the init.
            keys = jax.random.split(jax.random.key(seed + 1), 4)
            for k in keys:
                noise_keys = jax.random.split(k, len(jax.tree.leaves(template)))
                leaves = [
                    l + 0.05 * jax.random.normal(nk, l.shape)
                    for l, nk in zip(jax.tree.leaves(template), noise_keys)
                ]
                samples.append(
                    jax.tree.unflatten(jax.tree.structure(template), leaves)
                )
        return samples

    def infer(self, x, n_samples: Optional[int] = None) -> jax.Array:
        """Log-prob predictions [S, B, 10] from the first n_samples HMC
        draws (reference wilson.py:34-45)."""
        log_probs = self._predict(self._stacked, jnp.asarray(x))
        if n_samples is not None and n_samples < log_probs.shape[0]:
            log_probs = log_probs[:n_samples]
        return log_probs

    def log_marginal(self, x, n_samples: Optional[int] = None) -> jax.Array:
        lp = self.infer(x, n_samples)
        return jax.scipy.special.logsumexp(lp, axis=0) - jnp.log(
            jnp.float32(lp.shape[0])
        )
