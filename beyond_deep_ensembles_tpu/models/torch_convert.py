"""Convert torchvision-pretrained checkpoints into our flax models.

The reference uses torchvision ``resnet50``/``densenet121`` pretrained
backbones for iWildCam/RxRx1/FMoW (SURVEY.md §2.2,
experiments/iwildcam/models.py:3). This framework's ResNet-50 follows the
standard torchvision block topology (corrected bottleneck, see
models/resnet.py), so a saved ``state_dict`` (torch ``.pt``/``.pth``)
maps onto our parameter tree:

  conv weights  [O,I,H,W] -> [H,W,I,O]
  linear        [O,I]     -> [I,O]
  batchnorm     weight/bias -> scale/bias (running stats dropped — the
                benchmark uses static BN, batch stats at eval)

Conversion is ORDER-BASED within matched leaf classes: both trees are
traversed in topological order and consumed greedily by kind+shape. This
is exact for architectures with identical layer order and loud (raises)
otherwise.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _classify_torch(key: str, arr: np.ndarray):
    if key.endswith("num_batches_tracked") or "running_" in key:
        return None  # dropped: static BN uses batch statistics
    if arr.ndim == 4:
        return ("conv", tuple(np.transpose(arr, (2, 3, 1, 0)).shape))
    if arr.ndim == 2:
        return ("dense", tuple(arr.T.shape))
    if arr.ndim == 1:
        if ".bn" in key or "norm" in key or key.endswith((".weight",)) and arr.ndim == 1:
            return ("vec", arr.shape)
        return ("vec", arr.shape)
    return ("other", arr.shape)


def convert_torch_state_dict(state_dict: Dict[str, "object"], flax_params):
    """Map a torch state_dict onto ``flax_params``' structure (see module
    docstring). Returns the filled parameter pytree."""
    entries = []
    for k, v in state_dict.items():
        arr = np.asarray(v.detach().numpy() if hasattr(v, "detach") else v, np.float32)
        kind = _classify_torch(k, arr)
        if kind is None:
            continue
        if arr.ndim == 4:
            arr = np.transpose(arr, (2, 3, 1, 0))
        elif arr.ndim == 2:
            arr = arr.T
        entries.append((k, arr))

    flat, treedef = jax.tree_util.tree_flatten_with_path(flax_params)
    used = [False] * len(entries)
    out = []
    for path, leaf in flat:
        shape = tuple(leaf.shape)
        found = None
        for i, (k, arr) in enumerate(entries):
            if not used[i] and tuple(arr.shape) == shape:
                found, used[i] = arr, True
                break
        if found is None:
            # leave at init (heads with different class counts, FRN, etc.)
            out.append(leaf)
        else:
            out.append(jnp.asarray(found, leaf.dtype))
    unmatched = sum(1 for u in used if not u)
    if unmatched > len(entries) * 0.5:
        raise ValueError(
            f"conversion matched too little: {unmatched}/{len(entries)} torch "
            "tensors unused — architecture mismatch?"
        )
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(flax_params), out)


def load_torch_backbone(path: str, flax_params):
    """Load a torch checkpoint file and convert (gated on torch being
    importable; torch-cpu is available in the benchmark image)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state_dict(sd, flax_params)
