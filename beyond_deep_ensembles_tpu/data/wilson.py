"""Wilson-et-al HMC posterior-sample baseline.

Reference src/wilson.py:22-57 + google-bnn-hmc: loads the published HMC
sample checkpoints and evaluates them to produce the "ground-truth"
posterior predictive that CIFAR eval compares against (agreement / total
variation, experiments/cifar/cifar.py:105-121).

Checkpoint format (reference src/wilson.py:47-56 + bnn_hmc
checkpoint_utils): ONE pickle per sample,
``$BDE_DATA_DIR/wilson_hmc/<dataset>/state-<i>.pkl`` for i in 0..260,
each a dict with ``params`` (haiku resnet20_frn_swish tree) and
``net_state``, where EVERY leaf carries a leading 3-chain axis — the
reference slices ``p[chain_id]`` per chain (wilson.py:54-56). A legacy
``wilson_hmc/chain<k>/*.pkl`` per-chain-directory layout of unstacked
trees is also accepted.

TPU-native: no torch<->jax bridge (reference wilson.py:34-45 round-trips
through numpy per batch). Samples are converted ONCE into the flax
``WilsonResNet20`` layout — a faithful port of the vendored architecture
(models/resnet.py cites bnn_hmc models.py:95-176; it differs from the
torch-reference ResNet20) — by a DETERMINISTIC NAME MAP (haiku
``conv2_d{,_i}``/``frn{,_i}``/``linear`` -> flax ``conv_{i}``/``frn_{i}``
/``linear``), stacked on a sample axis, and the predictive runs as one
vmapped jitted program. Conversion is proven bit-exact against the live
vendored haiku model in tests/test_wilson_bridge.py.
"""
from __future__ import annotations

import os
import pickle
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.resnet import WilsonResNet20
from ..nn.base import Model
from ..tree import tree_stack
from .uci import data_dir


def _haiku_module_name(flax_name: str) -> str:
    """conv_0 -> conv2_d, conv_3 -> conv2_d_3, frn_0 -> frn, ..."""
    kind, idx = flax_name.rsplit("_", 1)
    base = {"conv": "conv2_d", "frn": "frn"}[kind]
    return base if idx == "0" else f"{base}_{idx}"


def convert_wilson_sample(haiku_params: dict, flax_template: dict) -> dict:
    """Deterministic name-map conversion of one haiku resnet20_frn_swish
    parameter tree into the flax WilsonResNet20 layout.

    haiku: {'conv2_d{,_i}': {'w','b'}, 'frn{,_i}': {'tau','beta','gamma'
    each (1,1,1,C)}, 'linear': {'w','b'}} (vendored models.py:76-176);
    module keys may carry a transform prefix ('res_net/~/conv2_d') which
    is stripped. No shape guessing: identically-shaped FRN leaves cannot
    cross-assign.
    """
    # strip any haiku path prefixes ('scope/~/conv2_d' -> 'conv2_d')
    src = {k.split("/")[-1]: v for k, v in haiku_params.items()}

    def leaf(module: str, name: str, like):
        arr = jnp.asarray(src[module][name], jnp.float32)
        return arr.reshape(like.shape)

    out = {}
    for fk, sub in flax_template.items():
        if fk == "linear":
            out[fk] = {
                "kernel": leaf("linear", "w", sub["kernel"]),
                "bias": leaf("linear", "b", sub["bias"]),
            }
        elif fk.startswith("conv_"):
            hk_name = _haiku_module_name(fk)
            out[fk] = {
                "kernel": leaf(hk_name, "w", sub["kernel"]),
                "bias": leaf(hk_name, "b", sub["bias"]),
            }
        elif fk.startswith("frn_"):
            hk_name = _haiku_module_name(fk)
            # our FilterResponseNorm nests its params one level down
            inner_key = next(iter(sub))
            inner = sub[inner_key] if inner_key == "FilterResponseNorm_0" else sub
            converted = {
                n: leaf(hk_name, n, inner[n]) for n in ("beta", "gamma", "tau")
            }
            out[fk] = (
                {inner_key: converted} if inner_key == "FilterResponseNorm_0" else converted
            )
        else:
            raise ValueError(f"unexpected flax scope {fk!r} in Wilson template")
    return out


def _chain_count(tree) -> int:
    return int(jax.tree.leaves(tree)[0].shape[0])


class WilsonHMC:
    """Reference WilsonHMC (src/wilson.py:22-57): posterior predictive of
    the published HMC chains on CIFAR-10 batches."""

    def __init__(
        self,
        max_samples_per_chain: Optional[int] = None,
        seed: int = 0,
        dataset: str = "cifar10",
    ):
        self.model = Model(WilsonResNet20(classes=10, activation="swish"))
        example = jnp.zeros((1, 32, 32, 3), jnp.float32)
        template, self._model_state = self.model.init(jax.random.key(seed), example)

        samples = self._load_samples(template, max_samples_per_chain, seed, dataset)
        self._stacked = tree_stack(samples)
        self.n_samples = len(samples)

        def forward_one(params, x):
            out, _, _ = self.model.apply(
                params, self._model_state, None, x, train=False, mutable_state=False
            )
            return jax.nn.log_softmax(out, axis=-1)

        self._predict = jax.jit(jax.vmap(forward_one, in_axes=(0, None)))

    def _load_samples(self, template, max_per_chain, seed, dataset) -> List[dict]:
        root = os.path.join(data_dir(), "wilson_hmc")
        samples: List[dict] = []

        # Published layout: <root>/<dataset>/state-<i>.pkl, each with a
        # leading 3-chain axis on every leaf (reference wilson.py:47-56).
        pub_dir = os.path.join(root, dataset)
        if os.path.isdir(pub_dir):
            files = sorted(
                (f for f in os.listdir(pub_dir) if re.match(r"state-\d+\.pkl$", f)),
                key=lambda f: int(re.findall(r"\d+", f)[0]),
            )
            if max_per_chain:
                files = files[:max_per_chain]
            for f in files:
                with open(os.path.join(pub_dir, f), "rb") as fh:
                    ckpt = pickle.load(fh)
                params = ckpt["params"] if isinstance(ckpt, dict) and "params" in ckpt else ckpt
                for chain in range(_chain_count(params)):
                    chain_tree = jax.tree.map(lambda p: p[chain], params)
                    samples.append(convert_wilson_sample(chain_tree, template))
            if samples:
                return samples

        # Legacy layout: <root>/chain<k>/*.pkl of unstacked trees.
        if os.path.isdir(root):
            for chain in sorted(os.listdir(root)):
                cdir = os.path.join(root, chain)
                if not os.path.isdir(cdir) or chain == dataset:
                    continue
                files = sorted(os.listdir(cdir))
                if max_per_chain:
                    files = files[:max_per_chain]
                for f in files:
                    with open(os.path.join(cdir, f), "rb") as fh:
                        ckpt = pickle.load(fh)
                    tree = ckpt.get("params", ckpt) if isinstance(ckpt, dict) else ckpt
                    samples.append(convert_wilson_sample(tree, template))
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
