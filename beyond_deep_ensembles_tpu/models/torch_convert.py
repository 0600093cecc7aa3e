"""Convert torchvision-pretrained checkpoints into our flax models.

The reference uses torchvision ``resnet50``/``densenet121`` pretrained
backbones for iWildCam/RxRx1/FMoW (SURVEY.md §2.2,
experiments/iwildcam/models.py:3). ``ResNet50(torchvision=True)``
reproduces the torchvision topology exactly, so a saved ``state_dict``
(torch ``.pt``/``.pth``) transplants with logit parity:

  conv weights  [O,I,H,W] -> [H,W,I,O]
  linear        [O,I]     -> [I,O]
  norm weight   -> flax 'scale';  norm/linear bias -> flax 'bias'
  running stats dropped (the benchmark uses static BN: batch stats at
  eval, reference iwildcam/models.py:53-55 static_bn patch)

Matching is order-based WITHIN kind buckets (conv / dense / scale /
bias): both trees are enumerated in definition order — torch state_dicts
are insertion-ordered; flax paths are sorted with a numeric-aware key so
``Bottleneck_10`` follows ``Bottleneck_9``, not ``Bottleneck_1`` — and
consumed greedily by shape. Exact for architectures with identical layer
order; loud (raises) when too little matches.
"""
from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_NUM_RE = re.compile(r"(\d+)")


def _natural_key(path) -> tuple:
    """Numeric-aware sort key over a flax key path, so module auto-names
    sort in definition order (Conv_2 < Conv_10)."""
    parts = []
    for p in path:
        name = getattr(p, "key", getattr(p, "name", str(p)))
        parts.extend(
            int(tok) if tok.isdigit() else tok for tok in _NUM_RE.split(str(name))
        )
    return tuple((0, t) if isinstance(t, int) else (1, t) for t in parts)


def _match_order(flax_params, flat):
    """Enumerate flax leaves in MODULE-CREATION order — flax's param dicts
    preserve insertion order, which equals forward-pass order, which
    equals a torch ``nn.Sequential``'s state_dict order. This is what
    makes greedy within-bucket matching exact: alphabetical sorting put
    e.g. the ResNet20 stem conv (``Conv_0``) after every
    ``BasicBlock_*``, cross-assigning its (16,) bias with the first
    block's. Falls back to the numeric-aware sort for containers that
    don't preserve order."""
    paths = []

    def walk(node, prefix):
        if isinstance(node, dict) or hasattr(node, "items"):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            paths.append(prefix)

    try:
        walk(flax_params, ())
    except Exception:
        return sorted(range(len(flat)), key=lambda i: _natural_key(flat[i][0]))

    def path_str(path):
        return tuple(
            str(getattr(p, "key", getattr(p, "name", str(p)))) for p in path
        )

    index = {p: i for i, p in enumerate(paths)}
    if len(index) != len(flat):
        return sorted(range(len(flat)), key=lambda i: _natural_key(flat[i][0]))
    try:
        return sorted(range(len(flat)), key=lambda i: index[path_str(flat[i][0])])
    except KeyError:
        return sorted(range(len(flat)), key=lambda i: _natural_key(flat[i][0]))


_FRN_NAMES = ("tau", "beta", "gamma")

# Reference Rank1Linear/Rank1Conv2D (src/algos/rank1.py:20-24,76-81) keep
# the per-component multiplicative factors as ModuleLists of
# GaussianParameters — state_dict keys ``<layer>.s.<i>.mean`` /
# ``<layer>.r.<i>.mean``. Our Rank1Dense/Rank1Conv stack the components on
# a leading axis (nn/rank1.py): ``s__gmean``/``r__gmean`` of shape
# [components, dim]. The converter stacks the torch components in index
# order into one array per factor.
_RANK1_FACTOR_RE = re.compile(r"^(.*\.[sr])\.(\d+)\.mean$")


def _leaf_kind(path, leaf) -> str:
    name = str(getattr(path[-1], "key", getattr(path[-1], "name", str(path[-1]))))
    # Variational std / MLE-only leaves keep their init — pretrained
    # transplant fills only the means (the reference converts pretrained
    # nets in place, leaving rho at its Blundell init,
    # bbb_layers.py:278-300 make_module_bbb).
    if name.endswith(("__grho", "__mle", "_rho")) or name == "rho":
        return "skip"
    # Rank-1 factor means: [components, dim] stacks (nn/rank1.py)
    if name in ("s__gmean", "r__gmean"):
        return "factor"
    # Rank-1 per-component bias [components, out] (nn/rank1.py bias param)
    if name == "bias" and leaf.ndim == 2:
        return "cbias"
    # FRN leaves get their own name buckets: dozens of identically-shaped
    # (C,) tau/beta/gamma would otherwise cross-assign under greedy shape
    # matching (the bug class of PARITY delta #11).
    for frn in _FRN_NAMES:
        if name == frn or name.startswith(frn + "__"):
            return frn
    if leaf.ndim >= 3:
        return "conv"
    if leaf.ndim == 2:
        return "dense"
    if name in ("scale", "weight"):
        return "scale"
    return "bias"


def _torch_kind(key: str, arr: np.ndarray):
    if key.endswith("num_batches_tracked") or "running_" in key:
        return None  # dropped: static BN uses batch statistics
    base = key.rsplit(".", 1)[-1]
    # Reference GaussianParameter (src/algos/util.py:151-159) registers
    # ``.mu`` / ``.rho`` submodule parameters. rho (variational std) stays
    # at our init — dropping it here keeps a 2-d ``weight.rho`` from
    # cross-assigning into the dense bucket; mu is the mean and maps like
    # the parameter it wraps (``weight.mu`` -> conv/dense by ndim,
    # ``bias.mu`` -> bias).
    if base == "rho" or base.endswith("_rho"):
        return None
    if base == "mu":
        key = key[: -len(".mu")]
        base = key.rsplit(".", 1)[-1]
    # Spectral-norm power-iteration vectors (reference
    # kernel/spectral_norm.py:45-46 `_u`/`_v` buffers): transient state,
    # re-estimated on our side — and 1-d, so without this drop they would
    # pollute the scale/bias buckets and cross-assign real parameters.
    if base in ("_u", "_v"):
        return None
    # Rank-1 per-component bias (rank1.py:28,86: nn.Parameter of shape
    # [components, out]) — the only 2-d ``.bias`` in the reference; kept
    # untransposed, matched against our [components, out] leaf
    if base == "bias" and arr.ndim == 2:
        return "cbias"
    # SNGP head buffers (reference kernel/sngp.py Laplace.register_buffer):
    # precision/covariance live in our mutable `sngp` collection, the RFF
    # W/b and JL random_matrix in the `buffers` collection — none are flax
    # params, and precision/covariance are square matrices that the dense
    # bucket could otherwise swallow. Transplant them separately (see
    # transplant_sngp_buffers).
    if base in ("precision", "covariance", "seen_data", "feature_scale",
                "random_matrix") or ".rff." in key:
        return None
    # reference FRN stores tau/beta/gamma (or *_mu) as [1,C,1,1]
    # (src/architectures/frn.py:12-15); squeeze to our (C,) layout
    for frn in _FRN_NAMES:
        if base in (frn, frn + "_mu"):
            return frn
    if arr.ndim == 4:
        return "conv"
    if arr.ndim == 2:
        return "dense"
    if arr.ndim == 1:
        return "bias" if key.endswith(".bias") else "scale"
    return None


def convert_torch_state_dict(state_dict: Dict[str, "object"], flax_params):
    """Map a torch state_dict onto ``flax_params``' structure (see module
    docstring). Returns the filled parameter pytree."""
    buckets: dict = {
        k: []
        for k in ("conv", "dense", "scale", "bias", "factor", "cbias", *_FRN_NAMES)
    }
    total = 0

    def to_np(v):
        return np.asarray(
            v.detach().numpy() if hasattr(v, "detach") else v, np.float32
        )

    # group rank-1 factor components ``<layer>.{s,r}.<i>.mean`` by their
    # <layer>.{s,r} prefix; the stacked [components, dim] array enters the
    # factor bucket at the first component's state_dict position, keeping
    # the within-bucket order aligned with flax definition order
    factor_groups: Dict[str, list] = {}
    for k in state_dict:
        m = _RANK1_FACTOR_RE.match(k)
        if m:
            factor_groups.setdefault(m.group(1), []).append(k)

    for k, v in state_dict.items():
        m = _RANK1_FACTOR_RE.match(k)
        if m:
            group = factor_groups[m.group(1)]
            if k != group[0]:
                continue  # stacked with the first component
            comps = sorted(group, key=lambda kk: int(_RANK1_FACTOR_RE.match(kk).group(2)))
            buckets["factor"].append(
                [m.group(1), np.stack([to_np(state_dict[kk]) for kk in comps]), False]
            )
            total += 1
            continue
        arr = to_np(v)
        kind = _torch_kind(k, arr)
        if kind is None:
            continue
        if kind in _FRN_NAMES:
            arr = arr.reshape(-1)  # [1,C,1,1] -> (C,)
        elif kind == "conv":
            arr = np.transpose(arr, (2, 3, 1, 0))
        elif kind == "dense":
            arr = arr.T
        buckets[kind].append([k, arr, False])
        total += 1

    flat, treedef = jax.tree_util.tree_flatten_with_path(flax_params)
    order = _match_order(flax_params, flat)
    out = [None] * len(flat)
    for i in order:
        path, leaf = flat[i]
        kind = _leaf_kind(path, leaf)
        shape = tuple(leaf.shape)
        found = None
        for entry in buckets.get(kind, ()):
            if not entry[2] and tuple(entry[1].shape) == shape:
                found, entry[2] = entry[1], True
                break
        # unmatched leaves stay at init (heads with different class
        # counts, FRN params, variational rho, ...)
        out[i] = leaf if found is None else jnp.asarray(found, leaf.dtype)

    unmatched = sum(1 for b in buckets.values() for e in b if not e[2])
    if total and unmatched > total * 0.5:
        raise ValueError(
            f"conversion matched too little: {unmatched}/{total} torch "
            "tensors unused — architecture mismatch?"
        )
    return jax.tree_util.tree_unflatten(treedef, out)


def transplant_sngp_buffers(state_dict: Dict[str, "object"], model_state: dict):
    """Fill our ``buffers`` collection from a reference ``SNGPWrapper``
    state_dict (kernel/sngp.py): the random-Fourier-feature ``rff.W`` /
    ``rff.b`` and the optional JL ``random_matrix`` are registered torch
    buffers (not parameters), drawn at construction — matched predictions
    require carrying them over verbatim. Torch stores W as [D, R] used as
    ``x @ W`` (sngp.py:52), the same layout as ours. Returns a new
    model_state; non-SNGP models pass through unchanged."""
    src = {}
    for k, v in state_dict.items():
        base = k.rsplit(".", 1)[-1]
        if ".rff." in k and base in ("W", "b"):
            src[base] = np.asarray(v.detach().numpy() if hasattr(v, "detach") else v,
                                   np.float32)
        elif base == "random_matrix":
            # reference applies F.linear(x, random_matrix) with shape
            # [G, D] (sngp.py:79-81); ours right-multiplies f @ rm [D, G]
            arr = np.asarray(v.detach().numpy() if hasattr(v, "detach") else v,
                             np.float32)
            src[base] = arr.T
    if not src or "buffers" not in model_state:
        return model_state

    def fill(node):
        if isinstance(node, dict) or hasattr(node, "items"):
            return {k: (jnp.asarray(src[k]) if k in src and not (
                isinstance(v, dict) or hasattr(v, "items")
            ) else fill(v)) for k, v in node.items()}
        return node

    out = dict(model_state)
    out["buffers"] = fill(model_state["buffers"])
    return out


def load_torch_backbone(path: str, flax_params):
    """Load a torch checkpoint file and convert (gated on torch being
    importable; torch-cpu is available in the benchmark image)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state_dict(sd, flax_params)
